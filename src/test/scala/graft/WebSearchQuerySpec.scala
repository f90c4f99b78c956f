package graft

import graft.functions.WebSearchQuery
import graft.functions.WebSearchQuery._
import org.scalatest.funsuite.AnyFunSuite

class WebSearchQuerySpec extends AnyFunSuite {

  test("plain words AND together") {
    assert(parse("hash merge") == And(Term("hash"), Term("merge")))
  }

  test("quoted text is a phrase; single-term phrase degrades") {
    assert(parse("\"hash join\"") == Phrase(Seq("hash", "join")))
    assert(parse("\"hash\"") == Term("hash"))
  }

  test("OR keyword disjoins, case-insensitive; empty arm drops") {
    assert(parse("hash OR merge") == Or(Term("hash"), Term("merge")))
    assert(parse("hash or merge") == Or(Term("hash"), Term("merge")))
    // 'the' is a stopword: the arm vanishes, PG's 'the OR cat' -> cat
    assert(parse("the OR hash") == Term("hash"))
    assert(parse("hash OR") == Term("hash"))
  }

  test("glued - negates a word or a phrase; lone - is noise") {
    assert(parse("hash -sort") == And(Term("hash"), Not(Term("sort"))))
    assert(parse("hash -\"merge sort\"") ==
      And(Term("hash"), Not(Phrase(Seq("merge", "sort")))))
    assert(parse("hash - merge") == And(Term("hash"), Term("merge")))
  }

  test("nothing is a syntax error: stray operators, unclosed quote") {
    // &|!() are just characters the analyzer strips
    assert(parse("(hash) & !merge") match {
      case And(_, _) => true
      case _ => false
    })
    // unclosed quote runs to end of string
    assert(parse("\"hash join") == Phrase(Seq("hash", "join")))
  }

  test("stopword-only query is rejected") {
    intercept[IllegalArgumentException] { parse("the a of") }
  }

  test("precedence: OR binds weaker than implicit AND") {
    val n = parse("hash join OR merge sort")
    assert(n == Or(And(Term("hash"), Term("join")),
      And(Term("merge"), Term("sort"))))
  }

  test("positiveAtoms excludes negated-only atoms") {
    val n = parse("\"hash join\" OR merge -sort")
    val pos = positiveAtoms(n)
    assert(pos.contains(Phrase(Seq("hash", "join"))))
    assert(pos.contains(Term("merge")))
    assert(!pos.contains(Term("sort")))
    assert(atoms(n).contains(Term("sort")))
  }
}
