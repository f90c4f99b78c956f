package graft.functions

/** Boolean query mini-language — the full `tsquery` connective surface
  * (`&`, `|`, `!`, parentheses) the reference's plainto_tsquery path
  * flattens away (/root/reference/src/core/vector_store.py builds
  * AND-only queries; PG's to_tsquery accepts the full algebra this
  * parser implements). One recursive-descent parse on the DRIVER (query
  * strings are bytes, never data), then the SAME AST generates both the
  * Spark predicate and the oracle SQL — the two engines cannot drift
  * because there is one source of truth for the semantics.
  *
  * Grammar (standard precedence, NOT > AND > OR):
  *   or    := and ('|' and)*
  *   and   := unary ('&' unary)*
  *   unary := '!' unary | '(' or ')' | TERM
  * Terms are analyzed with the owned [[TextAnalyzer]] normalization
  * (lowercase; must survive the token filter).
  */
object BoolQuery {

  sealed trait Node
  final case class Term(t: String) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(e: Node) extends Node

  def parse(q: String): Node = {
    val toks = tokenize(q)
    val (node, rest) = parseOr(toks)
    require(rest.isEmpty, s"trailing input: ${rest.mkString(" ")}")
    node
  }

  private def tokenize(q: String): List[String] =
    q.replace("(", " ( ").replace(")", " ) ")
      .replace("&", " & ").replace("|", " | ").replace("!", " ! ")
      .split("\\s+").filter(_.nonEmpty).toList

  private def parseOr(ts: List[String]): (Node, List[String]) = {
    var (l, rest) = parseAnd(ts)
    while (rest.headOption.contains("|")) {
      val (r, rest2) = parseAnd(rest.tail)
      l = Or(l, r); rest = rest2
    }
    (l, rest)
  }

  private def parseAnd(ts: List[String]): (Node, List[String]) = {
    var (l, rest) = parseUnary(ts)
    while (rest.headOption.contains("&")) {
      val (r, rest2) = parseUnary(rest.tail)
      l = And(l, r); rest = rest2
    }
    (l, rest)
  }

  private def parseUnary(ts: List[String]): (Node, List[String]) =
    ts match {
      case "!" :: tail =>
        val (e, rest) = parseUnary(tail); (Not(e), rest)
      case "(" :: tail =>
        val (e, rest) = parseOr(tail)
        require(rest.headOption.contains(")"), "unbalanced parens")
        (e, rest.tail)
      case t :: tail =>
        val analyzed = TextAnalyzer.analyze(t)
        require(analyzed.length == 1, s"not a single analyzable term: $t")
        (Term(analyzed.head), tail)
      case Nil => throw new IllegalArgumentException("empty query")
    }

  /** All distinct terms, left-to-right. */
  def terms(n: Node): Seq[String] = (n match {
    case Term(t) => Seq(t)
    case And(l, r) => terms(l) ++ terms(r)
    case Or(l, r) => terms(l) ++ terms(r)
    case Not(e) => terms(e)
  }).distinct

  /** Terms that occur in at least one NON-negated position — the rank
    * contributors (a doc matching `a & !b` should rank by a's tf, not
    * be rewarded for containing b). */
  def positiveTerms(n: Node, neg: Boolean = false): Seq[String] =
    (n match {
      case Term(t) => if (neg) Seq.empty else Seq(t)
      case And(l, r) => positiveTerms(l, neg) ++ positiveTerms(r, neg)
      case Or(l, r) => positiveTerms(l, neg) ++ positiveTerms(r, neg)
      case Not(e) => positiveTerms(e, !neg)
    }).distinct

  /** Driver-side evaluation under a fixed presence assignment — the
    * index-route probe asking "does a document containing NONE of the
    * query's terms match?" (a pure-negation query matches the all-
    * absent row, so the probe must start from the doc universe instead
    * of the postings). Same connective semantics as [[predicate]]. */
  def matches(n: Node, present: String => Boolean): Boolean = n match {
    case Term(t) => present(t)
    case And(l, r) => matches(l, present) && matches(r, present)
    case Or(l, r) => matches(l, present) || matches(r, present)
    case Not(e) => !matches(e, present)
  }

  /** Spark predicate over per-term presence columns `present(t)`. */
  def predicate(n: Node,
      present: String => org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = n match {
    case Term(t) => present(t)
    case And(l, r) => predicate(l, present) && predicate(r, present)
    case Or(l, r) => predicate(l, present) || predicate(r, present)
    case Not(e) => !predicate(e, present)
  }

  /** The SAME predicate as SQL text over `present(t)` SQL fragments. */
  def predicateSql(n: Node, present: String => String): String =
    n match {
      case Term(t) => present(t)
      case And(l, r) =>
        s"(${predicateSql(l, present)} AND ${predicateSql(r, present)})"
      case Or(l, r) =>
        s"(${predicateSql(l, present)} OR ${predicateSql(r, present)})"
      case Not(e) => s"(NOT ${predicateSql(e, present)})"
    }
}
