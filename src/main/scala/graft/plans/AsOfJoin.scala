package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The full custom-operator chain (preference class (c) of the build
  * brief): a native AS-OF JOIN as LogicalPlan + Strategy + physical
  * BinaryExecNode with a streaming sort-merge `doExecute`.
  *
  * Semantics: for every left row, attach the matching-key right row with
  * the greatest right-time <= left-time, or nulls (LEFT ASOF JOIN).
  * Keys and times must be LongType.
  *
  * The physical operator declares ClusteredDistribution on the key for
  * both children and (key, time) ascending child ordering — Catalyst's
  * EnsureRequirements then inserts the exchanges and sorts, exactly as
  * it does for SortMergeJoinExec; the merge itself is a single forward
  * pass per partition with O(1) state (the last candidate right row per
  * key), so the operator scales like a sort-merge join.
  *
  * The compositional formulation (Relational.asofLatestOrder's
  * union-sort-window) remains the preference-(a) path; this operator is
  * gated by the same DuckDB ASOF JOIN oracle and must agree with the
  * composition bit-for-bit (AsOfJoinSpec).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
      newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = Seq(
    SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
    SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending))

  // output rows stay hash-clustered on the left key — expose it so
  // downstream key-aligned aggregates/joins reuse the partitioning
  // instead of re-shuffling (the SortMergeJoinExec pattern)
  override def outputPartitioning
      : org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    // capture only serializable pieces (expressions + attribute seqs);
    // UnsafeProjections are codegen'd per-partition inside the closure
    val lExprs = Seq(leftKey, leftTime)
    val rExprs = Seq(rightKey, rightTime)
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val rightWidth = rOut.length
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(lExprs, lOut)
      val rkProj = UnsafeProjection.create(rExprs, rOut)
      val outProj = UnsafeProjection.create(allOut, allOut)
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rightWidth)
        private val rBuf = rIter.buffered
        private var candKey = 0L
        private var candRow: InternalRow = null // last right row <= lt for candKey

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkt = lkProj(l)
          // SQL NULL semantics: a NULL key or time never matches (getLong
          // would silently read NULL as 0 and join NULLs together)
          if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
            joined(l, nullRight)
            return outProj(joined)
          }
          val lk = lkt.getLong(0)
          val lt = lkt.getLong(1)
          // advance right: skip null-keyed rows (sorted NULLS FIRST, so
          // they sit at the stream head), consume rows with (rk < lk) or
          // (rk == lk && rt <= lt); remember the last matching-key row
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peekKt = rkProj(rBuf.head)
            if (peekKt.isNullAt(0) || peekKt.isNullAt(1)) { rBuf.next() }
            else {
              val rk = peekKt.getLong(0)
              val rt = peekKt.getLong(1)
              if (rk < lk) { rBuf.next() }
              else if (rk == lk && rt <= lt) {
                val r = rBuf.next()
                candKey = rk
                candRow = r.copy()
              } else advancing = false
            }
          }
          val matched = candRow != null && candKey == lk
          joined(l, if (matched) candRow else nullRight)
          outProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
      newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** No-op resolution rule slot (the chain's step 2): the plan is built
  * from already-resolved children, so nothing to rewrite — kept as the
  * documented hook. */
object ResolveAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan
}

/** Public entry: LEFT ASOF JOIN of two DataFrames on long-typed key and
  * time columns. Registers the planner strategy on first use (also
  * available via spark.sql.extensions=graft.plans.GraftExtensions). */
object AsOfJoin {
  def apply(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame,
      leftKey: String, leftTime: String,
      rightKey: String, rightTime: String): org.apache.spark.sql.DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lplan = left.queryExecution.analyzed
    val rplan = right.queryExecution.analyzed
    // self-joins would alias right attributes onto left ordinals in the
    // output projection (Dataset.join has a dedup rewrite; this bridge
    // does not) — demand distinct attribute lineage instead
    require(lplan.outputSet.intersect(rplan.outputSet).isEmpty,
      "right side shares attributes with left (self-join); " +
        "rename/alias the right DataFrame's columns first")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n' in ${p.output}"))
    org.apache.spark.sql.GraftPlanBridge.dataFrame(spark,
      AsOfJoinPlan(lplan, rplan,
        attr(lplan, leftKey), attr(lplan, leftTime),
        attr(rplan, rightKey), attr(rplan, rightTime)))
  }
}
