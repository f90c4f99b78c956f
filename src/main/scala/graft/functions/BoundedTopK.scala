package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Input/buffer element of [[BoundedTopK]]: a candidate row id with its
  * ranking score. */
case class Scored(id: Long, score: Double)

/** Bounded grouped top-k as a typed `Aggregator` — the scale-correct
  * alternative to the `row_number() OVER (PARTITION BY ...) <= k`
  * idiom. The window form must SHUFFLE EVERY ROW to its group before
  * ranking; an Aggregator participates in partial (map-side)
  * aggregation, so each map task forwards AT MOST k rows per group and
  * the exchange carries O(groups · k) instead of O(rows) — at 100 TB
  * with k=2 that is the difference between shuffling the orders table
  * and shuffling a per-customer digest. The buffer is a k-capped
  * sorted list (k is small by construction); `reduce` rejects
  * non-qualifying rows in O(1) against the current cutoff.
  *
  * Total order (score DESC, id ASC) — the same tiebreak every ranking
  * operator in this engine uses, so results are deterministic and
  * engine-comparable. Merge order across partitions cannot matter:
  * ids are unique and the k-cap is a function of the combined set.
  */
class BoundedTopK(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, "k must be positive")

  private val ord: Ordering[Scored] =
    Ordering.by((s: Scored) => (-s.score, s.id))

  override def zero: Seq[Scored] = Seq.empty

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    if (b.length >= k && ord.gt(a, b.last)) b // worse than the cutoff
    else ((b :+ a).sorted(ord)).take(k)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sorted(ord).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}
