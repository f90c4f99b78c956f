package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BoolQuery
import graft.functions.BoolQuery._

class BoolQuerySpec extends AnyFunSuite {

  test("precedence: NOT > AND > OR") {
    assert(BoolQuery.parse("hash | merge & !sort") ==
      Or(Term("hash"), And(Term("merge"), Not(Term("sort")))))
  }

  test("parens override precedence") {
    assert(BoolQuery.parse("(hash | merge) & !sort") ==
      And(Or(Term("hash"), Term("merge")), Not(Term("sort"))))
  }

  test("terms are analyzer-normalized") {
    assert(BoolQuery.parse("HASH & Merge") ==
      And(Term("hash"), Term("merge")))
  }

  test("positive terms exclude pure negations, keep double negations") {
    val n = BoolQuery.parse("hash & !(sort | !merge)")
    assert(BoolQuery.positiveTerms(n).toSet == Set("hash", "merge"))
    assert(BoolQuery.terms(n).toSet == Set("hash", "merge", "sort"))
  }

  test("malformed queries throw") {
    intercept[IllegalArgumentException](BoolQuery.parse(""))
    intercept[IllegalArgumentException](BoolQuery.parse("(hash & merge"))
    intercept[IllegalArgumentException](BoolQuery.parse("hash merge"))
  }

  test("predicateSql mirrors predicate structure") {
    val n = BoolQuery.parse("(hash | merge) & !sort")
    assert(BoolQuery.predicateSql(n, t => s"p_$t") ==
      "((p_hash OR p_merge) AND (NOT p_sort))")
  }
}
