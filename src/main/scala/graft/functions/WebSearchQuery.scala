package graft.functions

import scala.collection.mutable.ListBuffer

/** `websearch_to_tsquery` — the forgiving web-style query parser that
  * completes the tsquery family ([[BoolQuery]] is the strict `&`/`|`/
  * `!` algebra; the reference only ever builds plainto's AND-of-terms,
  * /root/reference/src/core/vector_store.py:223). Postgres semantics
  * (documented public behavior of websearch_to_tsquery):
  *
  *   - unquoted words AND together;
  *   - `"quoted text"` is a phrase (adjacent analyzed terms, the
  *     `<->` chain);
  *   - the bare keyword `OR` (case-insensitive) disjoins; an empty
  *     arm drops (`'the OR cat'` → `cat`);
  *   - a `-` glued to a word or opening quote negates it;
  *   - NOTHING is a syntax error: stray `&|!()` are term characters
  *     for the analyzer to clean, a lone `-` is noise, an unclosed
  *     quote runs to end-of-string;
  *   - tokens that analyze to nothing (stopwords) drop; a quoted
  *     phrase left with one term degrades to that term; a word whose
  *     analysis splits (e.g. `don't`) becomes a phrase, as PG does
  *     with multi-lexeme tokens.
  *
  * Like [[BoolQuery]]: ONE driver-side parse, then the SAME AST emits
  * both the Spark predicate and the oracle SQL, so the two engines
  * cannot drift.
  */
object WebSearchQuery {

  sealed trait Node
  final case class Term(t: String) extends Node
  final case class Phrase(ts: Seq[String]) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(e: Node) extends Node

  private sealed trait Raw
  private final case class RWord(w: String, neg: Boolean) extends Raw
  private final case class RPhrase(p: String, neg: Boolean) extends Raw
  private case object ROr extends Raw

  /** Lexer: whitespace-separated words, `"`-delimited phrases, glued
    * `-` negation, bare OR keyword. Never throws. */
  private def scan(q: String): List[Raw] = {
    val out = ListBuffer.empty[Raw]
    var i = 0
    def quoted(from: Int, neg: Boolean): Int = {
      val end = q.indexOf('"', from)
      val (body, ni) =
        if (end < 0) (q.substring(from), q.length)
        else (q.substring(from, end), end + 1)
      out += RPhrase(body, neg)
      ni
    }
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '"') i = quoted(i + 1, neg = false)
      else {
        var j = i
        while (j < q.length && !q(j).isWhitespace && q(j) != '"') j += 1
        val w = q.substring(i, j)
        if (w == "-" && j < q.length && q(j) == '"') i = quoted(j + 1, neg = true)
        else {
          if (w.equalsIgnoreCase("or")) out += ROr
          else if (w == "-") () // lone hyphen: noise
          else if (w.startsWith("-")) out += RWord(w.drop(1), neg = true)
          else out += RWord(w, neg = false)
          i = j
        }
      }
    }
    out.toList
  }

  private def atom(text: String, neg: Boolean): Option[Node] = {
    val ts = TextAnalyzer.analyze(text)
    if (ts.isEmpty) None
    else {
      val n = if (ts.length == 1) Term(ts.head) else Phrase(ts)
      Some(if (neg) Not(n) else n)
    }
  }

  /** Parse; requires at least one surviving atom (a query of pure
    * stopwords/noise has no executable meaning — the caller's empty
    * guard, same contract as the other search entrypoints). */
  def parse(q: String): Node = {
    val raws = scan(q)
    // split on OR into implicit-AND groups
    val groups = ListBuffer(ListBuffer.empty[Raw])
    raws.foreach {
      case ROr => groups += ListBuffer.empty[Raw]
      case r   => groups.last += r
    }
    val arms = groups.toList.flatMap { g =>
      val atoms = g.toList.flatMap {
        case RWord(w, neg)   => atom(w, neg)
        case RPhrase(p, neg) => atom(p, neg)
        case ROr             => None
      }
      if (atoms.isEmpty) None else Some(atoms.reduceLeft(And.apply))
    }
    require(arms.nonEmpty, "websearch query analyzes to no terms")
    arms.reduceLeft(Or.apply)
  }

  /** Distinct leaf atoms (terms and phrases), left-to-right. */
  def atoms(n: Node): Seq[Node] = (n match {
    case t: Term   => Seq(t)
    case p: Phrase => Seq(p)
    case And(l, r) => atoms(l) ++ atoms(r)
    case Or(l, r)  => atoms(l) ++ atoms(r)
    case Not(e)    => atoms(e)
  }).distinct

  /** Atoms in at least one non-negated position — rank contributors. */
  def positiveAtoms(n: Node, neg: Boolean = false): Seq[Node] =
    (n match {
      case t: Term   => if (neg) Seq.empty else Seq(t)
      case p: Phrase => if (neg) Seq.empty else Seq(p)
      case And(l, r) => positiveAtoms(l, neg) ++ positiveAtoms(r, neg)
      case Or(l, r)  => positiveAtoms(l, neg) ++ positiveAtoms(r, neg)
      case Not(e)    => positiveAtoms(e, !neg)
    }).distinct

  /** Driver-side evaluation under a fixed per-atom hit assignment —
    * the [[graft.functions.BoolQuery.matches]] twin for the index
    * route's all-absent probe. */
  def matches(n: Node, hit: Node => Boolean): Boolean = n match {
    case t: Term   => hit(t)
    case p: Phrase => hit(p)
    case And(l, r) => matches(l, hit) && matches(r, hit)
    case Or(l, r)  => matches(l, hit) || matches(r, hit)
    case Not(e)    => !matches(e, hit)
  }

  /** Spark predicate over per-atom match-count columns. */
  def predicate(n: Node,
      hits: Node => org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = n match {
    case t: Term   => hits(t) > 0
    case p: Phrase => hits(p) > 0
    case And(l, r) => predicate(l, hits) && predicate(r, hits)
    case Or(l, r)  => predicate(l, hits) || predicate(r, hits)
    case Not(e)    => !predicate(e, hits)
  }

  /** The SAME predicate as SQL text over per-atom count fragments. */
  def predicateSql(n: Node, hits: Node => String): String = n match {
    case t: Term   => s"${hits(t)} > 0"
    case p: Phrase => s"${hits(p)} > 0"
    case And(l, r) =>
      s"(${predicateSql(l, hits)} AND ${predicateSql(r, hits)})"
    case Or(l, r) =>
      s"(${predicateSql(l, hits)} OR ${predicateSql(r, hits)})"
    case Not(e) => s"(NOT ${predicateSql(e, hits)})"
  }
}
