package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Language identification by marker n-grams (build-brief text-analysis
  * requirement). A deliberately small, deterministic heuristic: each
  * supported language has a profile of distinctive character sequences
  * (function words with spaces, diacritics, affixes); the detected
  * language is the profile with the highest total marker-occurrence
  * count, CJK codepoints short-circuit to zh, ties resolve by profile
  * order. Pure column expressions — codegen'd, scan-local, no shuffle.
  *
  * This is the classic Cavnar-Trenkle n-gram idea reduced to a fixed
  * profile set; swap the profiles for trained frequency tables without
  * touching the plumbing.
  */
object LangId {

  /** Profile order is the tiebreak order. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to ", " is ", "ing ", " that "),
    "fr" -> Seq(" le ", " la ", " les ", " et ", " est ", " une ", "é", "è",
      " des "),
    "es" -> Seq(" el ", " los ", " las ", " es ", " una ", "ción", "ñ",
      " que "),
    "de" -> Seq(" der ", " die ", " und ", " ist ", " das ", "sch", "ß",
      " nicht "))

  private def countOccurrences(c: Column, marker: String): Column =
    ((length(c) - length(replace(c, lit(marker), lit("")))) /
      marker.length).cast("int")

  /** Add a `detected` column to `df` with the scores staged through a
    * projection barrier: without it, `greatest` + the tiebreak cascade
    * re-inline every per-language score expression (~Profiles²·markers
    * string scans per row — observed 20× slower). Preferred entry point
    * for corpus-scale use; `detect` remains for small/ad-hoc columns.
    */
  def withDetected(df: org.apache.spark.sql.DataFrame,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val c = col(textCol)
    // stage 1: materialize the padded/lowered text ONCE per row (the 30
    // marker counters would otherwise each re-run concat+lower)
    val padded = df.select(
      col("*"),
      explode(array(concat(lit(" "), lower(c), lit(" ")))).as("_padded"))
    // stage 2: score columns materialize once per row behind a barrier
    val scored = padded.select(
      col("*"),
      explode(array(struct(
        (Profiles.map { case (langCode, markers) =>
          markers.map(m => countOccurrences(col("_padded"), m))
            .reduce(_ + _).as(s"s_$langCode")
        } :+ (length(regexp_replace(c, "[^\\u4e00-\\u9fff]", "")) > 0)
          .as("cjk")): _*))).as("_lid"))
      .drop("_padded")
    val best = Profiles.map { case (l, _) => col(s"_lid.s_$l") }
      .reduce(greatest(_, _))
    val pick = Profiles.reverse.foldLeft(lit("und")) {
      case (acc, (langCode, _)) =>
        when(col(s"_lid.s_$langCode") === best && best > 0, lit(langCode))
          .otherwise(acc)
    }
    scored
      .withColumn("detected", when(col("_lid.cjk"), lit("zh")).otherwise(pick))
      .drop("_lid")
  }

  /** Detected language code for a text column. */
  def detect(c: Column): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    val hasCjk = length(regexp_replace(c, "[^\\u4e00-\\u9fff]", "")) > 0
    val scores = Profiles.map { case (langCode, markers) =>
      langCode -> markers.map(m => countOccurrences(padded, m))
        .reduce(_ + _)
    }
    val best = scores.map(_._2).reduce(greatest(_, _))
    // first profile (in order) achieving the best score; all-zero -> "und"
    val pick = scores.reverse.foldLeft(lit("und")) {
      case (acc, (langCode, s)) =>
        when(s === best && best > 0, lit(langCode)).otherwise(acc)
    }
    when(hasCjk, lit("zh")).otherwise(pick)
  }

  /** DuckDB SQL mirror of `detect` over a column named `col`, generated
    * from the same Profiles so the two cannot drift. */
  def sqlDetectExpr(col: String): String = {
    def esc(s: String) = s.replace("'", "''")
    val padded = s"(' ' || lower($col) || ' ')"
    val scoreExprs = Profiles.map { case (langCode, markers) =>
      langCode -> markers.map { m =>
        s"((length($padded) - length(replace($padded, '${esc(m)}', ''))) // ${m.length})"
      }.mkString("(", " + ", ")")
    }
    val best = s"greatest(${scoreExprs.map(_._2).mkString(", ")})"
    val cjk =
      s"length(regexp_replace($col, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) > 0"
    val branches = scoreExprs.map { case (langCode, s) =>
      s"WHEN $s = $best AND $best > 0 THEN '$langCode'"
    }.mkString(" ")
    s"CASE WHEN $cjk THEN 'zh' $branches ELSE 'und' END"
  }

  /** Scala mirror for tests. */
  def detectString(text: String): String = {
    if (text.exists(ch => ch >= 0x4e00 && ch <= 0x9fff)) return "zh"
    val padded = " " + text.toLowerCase + " "
    val scores = Profiles.map { case (langCode, markers) =>
      langCode -> markers.map { m =>
        (padded.length - padded.replace(m, "").length) / m.length
      }.sum
    }
    val best = scores.map(_._2).max
    if (best == 0) "und"
    else scores.find(_._2 == best).get._1
  }
}
