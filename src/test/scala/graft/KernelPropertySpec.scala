package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BqKernels, WinnowFps}
import graft.operators.TextOps

/** Property tests for the shared static kernels behind the native
  * Catalyst expressions — each checked against an independent naive
  * reimplementation over randomized inputs, so a future "optimization"
  * of a kernel loop cannot silently change semantics between the
  * fixture points the oracles pin. Pure JVM (no SparkSession): the
  * kernels are exactly the code both interpreted eval and generated
  * code call. */
class KernelPropertySpec extends AnyFunSuite {

  /** 200 randomized cases per property (scalacheck runner directly —
    * the scalatest bridge artifact isn't in the offline cache). */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def arr(xs: Array[Double]) =
    new GenericArrayData(xs.map(x => x: Any))

  private val vec64: Gen[Array[Double]] =
    Gen.containerOfN[Array, Double](64,
      Gen.chooseNum(-2.0, 2.0, 0.0, -1.0, 1.0))

  test("bq pack: bit i reflects strict positivity of element off+i") {
    check(Prop.forAll(vec64, Gen.oneOf(0, 32)) { (v, off) =>
      val w = BqKernels.pack(arr(v), vFloat = false, off)
      (0 until 32).forall { i =>
        val bit = (w >> i) & 1L
        bit == (if (v(off + i) > 0.0) 1L else 0L)
      }
    })
  }

  test("bq asym equals the naive weighted-mismatch sum") {
    check(Prop.forAll(vec64, vec64) { (stored, q) =>
      val w0 = BqKernels.pack(arr(stored), vFloat = false, 0)
      val w1 = BqKernels.pack(arr(stored), vFloat = false, 32)
      val naive = (0 until 64).map { i =>
        val bit = stored(i) > 0.0
        val sgn = q(i) > 0.0
        if (bit != sgn) Math.round(Math.abs(q(i)) * 1e6) else 0L
      }.sum
      BqKernels.asym(w0, w1, arr(q), qFloat = false) == naive
    })
  }

  test("bq asym is zero iff sign patterns agree everywhere (nonzero q)") {
    check(Prop.forAll(vec64) { v =>
      // compare a vector against itself: no mismatches, score 0
      val w0 = BqKernels.pack(arr(v), vFloat = false, 0)
      val w1 = BqKernels.pack(arr(v), vFloat = false, 32)
      BqKernels.asym(w0, w1, arr(v), qFloat = false) == 0L
    })
  }

  /** Naive winnowing reimplementation: per-window array_min over gram
    * hashes (the pre-kernel column formulation's semantics). */
  private def naiveWinnow(s: String): (Long, Seq[Long]) = {
    val codes = s.codePoints().toArray.map(_.toLong)
    val k = TextOps.WinnowK
    val w = TextOps.WinnowW
    val g = math.max(codes.length - k + 1, 0)
    val grams = (0 until g).map { i =>
      (0 until k).map(j => codes(i + j) * TextOps.WinnowPows(j)).sum %
        TextOps.WinnowM
    }
    val nw = math.max(g - w + 1, 0)
    val fps = (0 until nw).map(j => grams.slice(j, j + w).min)
      .distinct.sorted
    (g.toLong, fps)
  }

  private val asciiText: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n =>
      Gen.stringOfN(n, Gen.oneOf(('a' to 'z') :+ ' ' :+ '0' :+ '9')))

  test("winnow kernel equals the naive per-window minimum formulation") {
    check(Prop.forAll(asciiText) { s =>
      val row = WinnowFps.compute(UTF8String.fromString(s),
        TextOps.WinnowK, TextOps.WinnowW, TextOps.WinnowM,
        TextOps.WinnowPows.toArray)
      val got = (row.getLong(0),
        row.getArray(1).toLongArray().toSeq)
      got == naiveWinnow(s)
    })
  }

  test("winnow edge semantics: short inputs yield no grams / no fps") {
    val short = "ab" // below WinnowK
    val row = WinnowFps.compute(UTF8String.fromString(short),
      TextOps.WinnowK, TextOps.WinnowW, TextOps.WinnowM,
      TextOps.WinnowPows.toArray)
    assert(row.getLong(0) == 0L)
    assert(row.getArray(1).numElements() == 0)
  }

  // --- kmeans_assign (r17 verdict #5: the one kernel without the
  // house-standard property pin) -----------------------------------------

  private def larr(xs: Seq[Long]) = new GenericArrayData(xs.map(x => x: Any))

  /** The former aggregate∘zip_with column formulation, re-stated
    * naively: per-centroid Σ (qa−cent)² with wrapping 64-bit ops, then
    * the dist·k+c composite-key argmin (ties → lowest c). */
  private def naiveAssign(qa: Seq[Long],
      cents: Seq[Seq[Long]]): (Long, Seq[Long]) = {
    val k = cents.length
    val dists = cents.map(c =>
      qa.zip(c).foldLeft(0L) { case (acc, (a, b)) =>
        val d = a - b; acc + d * d
      })
    val key = dists.zipWithIndex
      .foldLeft(Long.MaxValue) { case (best, (d, c)) =>
        math.min(best, d * k + c)
      }
    (key % k, dists)
  }

  /** Small-value low-dim vectors so distance TIES are common — the
    * tie-break (lowest centroid index) is the part a loop rewrite
    * breaks silently. */
  private val tieVec: Gen[Seq[Long]] =
    Gen.chooseNum(1, 4).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-1L, 1L)).map(_.toSeq))

  test("kmeans_assign kernel equals the naive formulation, ties included") {
    val centsGen = for {
      dim <- Gen.chooseNum(1, 8)
      k <- Gen.chooseNum(1, 6)
      qa <- Gen.listOfN(dim, Gen.chooseNum(-1000000L, 1000000L))
      cents <- Gen.listOfN(k,
        Gen.listOfN(dim, Gen.chooseNum(-1000000L, 1000000L)))
    } yield (qa.toSeq, cents.map(_.toSeq))
    check(Prop.forAll(centsGen) { case (qa, cents) =>
      val row = graft.functions.KMeansAssign.assign(larr(qa),
        new GenericArrayData(cents.map(c => larr(c): Any)))
      val got = (row.getLong(0), row.getArray(1).toLongArray().toSeq)
      got == naiveAssign(qa, cents)
    })
    // tie-dense regime: 1-4 dims over {-1,0,1}, up to 6 centroids
    val tieGen = for {
      qa <- tieVec
      k <- Gen.chooseNum(1, 6)
      cents <- Gen.listOfN(k,
        Gen.listOfN(qa.length, Gen.chooseNum(-1L, 1L)).map(_.toSeq))
    } yield (qa, cents)
    check(Prop.forAll(tieGen) { case (qa, cents) =>
      val row = graft.functions.KMeansAssign.assign(larr(qa),
        new GenericArrayData(cents.map(c => larr(c): Any)))
      (row.getLong(0), row.getArray(1).toLongArray().toSeq) ==
        naiveAssign(qa, cents)
    })
  }

  test("kmeans_assign rejects ragged centroids instead of zero-padding") {
    intercept[IllegalArgumentException] {
      graft.functions.KMeansAssign.assign(larr(Seq(1L, 2L)),
        new GenericArrayData(Seq(larr(Seq(1L)): Any)))
    }
  }
}
