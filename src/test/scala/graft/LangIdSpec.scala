package graft

import org.apache.spark.sql.functions.col

import graft.functions.LangId

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private val samples = Seq(
    ("en", "The quick brown fox jumps over the lazy dog and runs to the hills."),
    ("en", "This is the kind of thing that happens when testing and shipping code."),
    ("fr", "Le chat est sur la table et les enfants mangent des pommes."),
    ("fr", "C'est une belle journée et la mer est calme près des côtes."),
    ("es", "El perro corre por las calles y una niña canta una canción."),
    ("es", "Los libros que me diste son una colección maravillosa."),
    ("de", "Der Hund und die Katze sind nicht im Haus, das ist schade."),
    ("de", "Ich wünsche einen schönen Tag und eine gute Reise nach München."),
    ("zh", "今天天气很好，我们去公园散步吧。"),
    ("zh", "这是一个测试句子。"))

  test("scala mirror detects all sample languages") {
    samples.foreach { case (expected, text) =>
      assert(LangId.detectString(text) == expected,
        s"'$text' -> ${LangId.detectString(text)}, wanted $expected")
    }
  }

  test("column expression agrees with the scala mirror") {
    val got = samples.map(_._2).toDF("text")
      .select(LangId.detect(col("text")).as("lang"))
      .collect().map(_.getString(0)).toSeq
    assert(got == samples.map(_._1))
  }

  test("text without any markers is 'und'") {
    assert(LangId.detectString("xyzzy plugh 12345") == "und")
  }

  test("withDetected (barrier-staged) agrees with detect on all samples") {
    val df = samples.map(_._2).toDF("text")
    val viaBarrier = LangId.withDetected(df, "text")
      .select("detected").collect().map(_.getString(0)).toSeq
    val viaExpr = df.select(LangId.detect(col("text")))
      .collect().map(_.getString(0)).toSeq
    assert(viaBarrier == viaExpr)
    assert(viaBarrier == samples.map(_._1))
  }

  test("fixture corpus (shared English vocabulary) detects as en") {
    val counts = Tables.documents(spark, Sf0001)
      .select(LangId.detect(col("text")).as("detected"))
      .groupBy("detected").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the word-soup fixture uses one English vocabulary for every lang tag
    assert(counts.keySet.contains("en"))
    assert(counts.getOrElse("en", 0L) > 300)
  }
}
