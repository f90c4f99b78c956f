package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003) of a
  * cleaned text column in ONE generated loop: char codes → K-gram
  * polynomial hashes mod M → sliding-window-W minima → sorted distinct
  * set. Returns struct<n_grams: bigint, fps: array<bigint>>.
  *
  * Exists as a native Expression because the column formulation
  * (graft.operators.TextOps.winnowSets) evaluated interpreted lambdas
  * at every level: one `transform` per char (ascii), one per gram
  * (K element_at + multiply-adds), and one per window position
  * (array_min over a fresh W-slice — O(n·W) allocations). This kernel
  * is the same arithmetic — identical integer gram hash (left-to-right
  * sum, one mod), identical window/edge semantics (no grams when
  * len < K, no fingerprints when grams < W), identical distinct+sort —
  * with an O(n) monotonic-deque window minimum, so results are
  * bit-identical to the former plan and the DuckDB oracle.
  *
  * Character semantics: Unicode CODE POINTS (surrogate pairs are one
  * code), matching both `split(text, "")` + `ascii` on BMP text and the
  * oracle's string_split_regex(s, '') + ascii.
  */
case class WinnowFps(child: Expression, k: Int, w: Int, m: Long,
    pows: Seq[Long]) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("fps", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fps expects string, got ${child.dataType.catalogString}")

  @transient private lazy val powArr: Array[Long] = pows.toArray

  override def nullSafeEval(input: Any): Any =
    WinnowFps.compute(input.asInstanceOf[UTF8String], k, w, m, powArr)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val powRef = ctx.addReferenceObj("winnowPows", powArr, "long[]")
    val cls = "graft.functions.WinnowFps"
    nullSafeCodeGen(ctx, ev,
      t => s"${ev.value} = $cls.compute($t, $k, $w, ${m}L, $powRef);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "winnow_fps"
}

object WinnowFps {

  /** Static kernel shared by interpreted eval and generated code.
    * Named `compute`, NOT `eval`: the companion CLASS inherits
    * Expression.eval, so a same-named object method gets no static
    * forwarder — janino then fails to resolve the generated call and
    * Spark silently drops the whole stage to interpreted evaluation
    * (caught by the round-11 codegen audit, not by correctness). */
  def compute(text: UTF8String, k: Int, w: Int, m: Long,
      pows: Array[Long]): InternalRow = {
    val s = text.toString
    // code points (one code per character, surrogate pairs included)
    val codes = new Array[Long](s.codePointCount(0, s.length))
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      codes(ci) = cp.toLong
      ci += 1
      off += Character.charCount(cp)
    }
    val n = codes.length
    val g = if (n >= k) n - k + 1 else 0
    val grams = new Array[Long](g)
    var i = 0
    while (i < g) {
      // identical arithmetic to the column formulation: left-to-right
      // Σ codes[i+j]·pows[j], ONE trailing mod (no overflow: codes ≤
      // ~2²¹, pows < M ≈ 2³⁰, K terms ≪ 2⁶³)
      var acc = 0L
      var j = 0
      while (j < k) { acc += codes(i + j) * pows(j); j += 1 }
      grams(i) = acc % m
      i += 1
    }
    // sliding-window minima via monotonic deque — O(g), same values as
    // array_min over each W-slice
    val nw = if (g >= w) g - w + 1 else 0
    val set = new java.util.TreeSet[java.lang.Long]()
    if (nw > 0) {
      val deque = new Array[Int](g)
      var head = 0
      var tail = 0 // exclusive
      var p = 0
      while (p < g) {
        while (tail > head && grams(deque(tail - 1)) >= grams(p)) tail -= 1
        deque(tail) = p
        tail += 1
        if (deque(head) <= p - w) head += 1
        if (p >= w - 1) set.add(grams(deque(head)))
        p += 1
      }
    }
    val fps = new Array[Long](set.size)
    val it = set.iterator()
    var fi = 0
    while (it.hasNext) { fps(fi) = it.next(); fi += 1 }
    new GenericInternalRow(Array[Any](g.toLong, new GenericArrayData(fps)))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "winnow_fps",
      (exprs: Seq[Expression]) => {
        import graft.operators.TextOps
        WinnowFps(exprs.head, TextOps.WinnowK, TextOps.WinnowW,
          TextOps.WinnowM, TextOps.WinnowPows)
      },
      "built-in")
}
