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
  *   4. drop tokens in a fixed English stopword list (no stemming in v1)
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
}
