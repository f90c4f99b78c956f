package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The owned text-analysis spec (SURVEY.md §7 phase 0).
  *
  * The reference delegates analysis to Postgres's `english` tsvector config
  * (Snowball stemming + stopwords), populated by a DB trigger the service
  * never sees (/root/reference/src/core/vector_store.py:104-105,
  * /root/reference/src/db/models.py:52). Bug-for-bug parity with the
  * Snowball stemmer is neither required nor desirable — what matters is
  * that index path, query path, and the DuckDB oracle use the IDENTICAL
  * analyzer. So we own the spec:
  *
  *   1. lowercase
  *   2. split on `\W+` (non-word characters, Java/RE2-compatible)
  *   3. drop tokens shorter than 2 characters
  *   4. drop tokens in a fixed English stopword list
  *   5. (FTS paths only) light-stem each surviving token — see `stemOne`
  *
  * Every constant here has a mirrored SQL fragment used to build oracle
  * queries, so the two paths cannot drift independently.
  */
object TextAnalyzer {
  val MinTokenLen = 2

  /** Fixed stopword list — deliberately small and frozen; mirrors the
    * high-frequency function words of PG's english config without stemming.
    */
  val StopWords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "not", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "be", "this", "that", "are",
    "was", "were", "from", "but", "they", "will", "have", "has", "had")

  private val StopSet = StopWords.toSet

  /** Fixed French stopword list — the high-frequency function words of
    * PG's `french` config, frozen for the same reason as `StopWords`. */
  val StopWordsFr: Seq[String] = Seq(
    "le", "la", "les", "de", "des", "du", "un", "une", "et", "ou",
    "est", "en", "que", "qui", "dans", "pour", "sur", "pas", "plus",
    "par", "avec", "son", "ses", "sa", "au", "aux", "ce", "ces", "se",
    "il", "elle", "ne", "je", "tu", "nous", "vous", "ils", "elles",
    "mais", "ont", "sont")

  /** Per-language analysis policy (reference surface: the FTS language
    * is a deployment parameter, /root/reference/src/config/settings.py:21,
    * applied at src/core/vector_store.py:222). `en` = English stopwords
    * + light stemmer; `fr` = French stopwords, NO stemmer (the light
    * stemmer encodes English morphology — applied to French it would
    * corrupt recall, so unsupported-stemmer languages bypass it); any
    * other language = bare tokenization (length filter only), the PG
    * `simple`-config analog. */
  def stopWordsFor(lang: String): Seq[String] = lang match {
    case "en" => StopWords
    case "fr" => StopWordsFr
    case _    => Seq.empty
  }

  val SplitPattern = "\\W+"

  /** tokens(content): Column[Array[String]] — the analyzed token stream
    * (duplicates preserved, order preserved; positions = array index).
    * Pure built-in functions → whole-stage codegen, no UDF.
    */
  def tokens(c: Column): Column =
    filter(
      split(lower(c), SplitPattern),
      t => length(t) >= MinTokenLen && !t.isin(StopWords: _*))

  /** Scala-side analyzer for query strings (driver-side, tiny input).
    * MUST match `tokens` exactly.
    */
  def analyze(text: String): Seq[String] =
    text.toLowerCase.split(SplitPattern).toSeq
      .filter(t => t.length >= MinTokenLen && !StopSet.contains(t))

  /** Language-keyed variant of `tokens` — identical mechanics, the
    * language's stopword set. */
  def tokensFor(c: Column, lang: String): Column = stopWordsFor(lang) match {
    case Nil =>
      filter(split(lower(c), SplitPattern), t => length(t) >= MinTokenLen)
    case stops =>
      filter(split(lower(c), SplitPattern),
        t => length(t) >= MinTokenLen && !t.isin(stops: _*))
  }

  /** Language-keyed variant of `analyze` (query path — MUST match
    * `tokensFor` exactly). */
  def analyzeFor(text: String, lang: String): Seq[String] = {
    val stops = stopWordsFor(lang).toSet
    text.toLowerCase.split(SplitPattern).toSeq
      .filter(t => t.length >= MinTokenLen && !stops.contains(t))
  }

  // ---- Light stemmer (F1 stemming, SURVEY §2.2) -------------------------
  //
  // The reference stems through PG's `english` Snowball config
  // (/root/reference/src/core/vector_store.py:222,
  // src/config/settings.py:21): a user searching "merging" matches
  // documents containing "merge". Snowball bug-for-bug parity is a
  // non-goal (same reasoning as the analyzer above) — what matters is
  // that the index path, the query path, and the DuckDB oracle stem
  // IDENTICALLY, so we own a 3-stage suffix stripper where both the
  // inflected and base forms reduce to one stem:
  //
  //   A (plural):   -ies → -y (len≥5); -s dropped (len≥4, not -ss/-us/-is)
  //   B (suffixes): -ing (len≥6) or -ed (len≥5) dropped, then a trailing
  //                 doubled consonant in {b d f g m n p r t} undoubled
  //                 (running→runn→run); -ly (len≥5) dropped
  //   C (final e):  -e dropped (len≥4)
  //
  // "merging"→B→"merg", "merges"→A→"merge"→C→"merg", "merge"→C→"merg";
  // "classes"→A→"classe"→C→"class" meets "class" (A protects -ss).
  // Stages run in order on every token; each stage has a Scala, a
  // Catalyst (graft.functions.LightStem), and a DuckDB-SQL rendering of
  // the SAME rules below.

  /** Consonants eligible for stage-B undoubling. */
  val UndoubleChars = "bdfgmnprt"

  def stemOne(w: String): String = {
    val a =
      if (w.length >= 5 && w.endsWith("ies")) w.dropRight(3) + "y"
      else if (w.length >= 4 && w.endsWith("s") && !w.endsWith("ss") &&
        !w.endsWith("us") && !w.endsWith("is")) w.dropRight(1)
      else w
    def undouble(y: String): String =
      if (y.length >= 2 && y(y.length - 1) == y(y.length - 2) &&
        UndoubleChars.indexOf(y(y.length - 1).toInt) >= 0) y.dropRight(1)
      else y
    val b =
      if (a.length >= 6 && a.endsWith("ing")) undouble(a.dropRight(3))
      else if (a.length >= 5 && a.endsWith("ed")) undouble(a.dropRight(2))
      else if (a.length >= 5 && a.endsWith("ly")) a.dropRight(2)
      else a
    if (b.length >= 4 && b.endsWith("e")) b.dropRight(1) else b
  }

  /** Driver-side stemmed analysis for query strings (mirror of
    * `stemmedTokens`; order preserved, duplicates preserved). */
  def analyzeStemmed(text: String): Seq[String] = analyze(text).map(stemOne)

  /** Stemmed analyzed token stream as a Column. The stem runs through the
    * native expression graft.functions.LightStem (whole-stage codegen);
    * call sites must LightStem.register(spark) first. */
  def stemmedTokens(c: Column): Column =
    transform(tokens(c), t => call_function("light_stem", t))

  /** Indexed-token stream honoring the language's stemmer policy:
    * only `en` stems; every other language bypasses the stemmer. */
  def stemmedTokensFor(c: Column, lang: String): Column =
    if (lang == "en") stemmedTokens(c) else tokensFor(c, lang)

  /** Query-path mirror of `stemmedTokensFor`. */
  def analyzeStemmedFor(text: String, lang: String): Seq[String] =
    if (lang == "en") analyzeStemmed(text) else analyzeFor(text, lang)

  // ---- Oracle-SQL mirrors (DuckDB dialect) ------------------------------

  /** SQL list literal of the stopwords, e.g. ('the','a',...). */
  def sqlStopList: String = StopWords.map(s => s"'$s'").mkString("(", ", ", ")")

  /** DuckDB fragment producing one row per analyzed token of column `col`.
    * Use inside: SELECT doc_id, unnest(...) AS term ... then filter.
    */
  def sqlTokenize(col: String): String =
    s"unnest(string_split_regex(lower($col), '\\W+'))"

  /** WHERE-clause filter matching steps 3-4 for a term column named `t`. */
  def sqlTermFilter(t: String): String =
    s"length($t) >= $MinTokenLen AND $t NOT IN $sqlStopList"

  /** Language-keyed `sqlTermFilter` — mirrors `tokensFor`. */
  def sqlTermFilterFor(t: String, lang: String): String =
    stopWordsFor(lang) match {
      case Nil => s"length($t) >= $MinTokenLen"
      case ws =>
        val list = ws.map(w => s"'$w'").mkString("(", ", ", ")")
        s"length($t) >= $MinTokenLen AND $t NOT IN $list"
    }

  /** Stage A of `stemOne` over an expression `x` (pass a short identifier;
    * oracles chain the stages through CTEs or list_transform steps so each
    * fragment stays linear in its input). */
  def sqlStemA(x: String): String =
    s"CASE WHEN length($x) >= 5 AND ends_with($x, 'ies') " +
      s"THEN substr($x, 1, length($x) - 3) || 'y' " +
      s"WHEN length($x) >= 4 AND ends_with($x, 's') " +
      s"AND NOT ends_with($x, 'ss') AND NOT ends_with($x, 'us') " +
      s"AND NOT ends_with($x, 'is') " +
      s"THEN substr($x, 1, length($x) - 1) ELSE $x END"

  private def sqlUndouble(y: String): String =
    s"CASE WHEN regexp_matches($y, '(bb|dd|ff|gg|mm|nn|pp|rr|tt)$$') " +
      s"THEN substr($y, 1, length($y) - 1) ELSE $y END"

  /** Stage B of `stemOne` over an expression `x`. */
  def sqlStemB(x: String): String =
    s"CASE WHEN length($x) >= 6 AND ends_with($x, 'ing') " +
      s"THEN ${sqlUndouble(s"substr($x, 1, length($x) - 3)")} " +
      s"WHEN length($x) >= 5 AND ends_with($x, 'ed') " +
      s"THEN ${sqlUndouble(s"substr($x, 1, length($x) - 2)")} " +
      s"WHEN length($x) >= 5 AND ends_with($x, 'ly') " +
      s"THEN substr($x, 1, length($x) - 2) ELSE $x END"

  /** Stage C of `stemOne` over an expression `x`. */
  def sqlStemC(x: String): String =
    s"CASE WHEN length($x) >= 4 AND ends_with($x, 'e') " +
      s"THEN substr($x, 1, length($x) - 1) ELSE $x END"

  /** CTE fragment: (doc_id, t0) rows in `src` → (doc_id, term) stemmed
    * rows in `stemmed`. Splice after a filtered-token CTE. */
  def sqlStemCtes(src: String): String =
    s"""st_a AS (SELECT doc_id, ${sqlStemA("t0")} AS t1 FROM $src),
       |st_b AS (SELECT doc_id, ${sqlStemB("t1")} AS t2 FROM st_a),
       |stemmed AS (SELECT doc_id, ${sqlStemC("t2")} AS term FROM st_b)""".stripMargin
}
