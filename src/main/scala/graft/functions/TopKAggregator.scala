package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Scored item for grouped top-k aggregation. */
final case class Scored(id: Long, score: Double)

/** Typed `Aggregator` computing the top-k items per group by
  * (score desc, id asc) — the UDAF tier of the custom-operator
  * preference order (SURVEY §2.2 UDF/UDAF row).
  *
  * Why an Aggregator instead of a window: `row_number().over(
  * partitionBy(g).orderBy(...))` sorts EVERY row of every group, then
  * discards all but k. This buffer keeps at most k elements per group
  * per partition and merges map-side (partial aggregation), so the
  * shuffle carries ≤ k rows per (group, map task) instead of the whole
  * group — the difference between O(n log n) total sort and O(n log k)
  * with a k-bounded shuffle. At 100 TB with heavy groups this is the
  * only shape that works; it is how `TakeOrderedAndProject` thinks,
  * per group.
  *
  * Buffer is a sorted Vector (k is small); reduce/merge keep the
  * invariant. Deterministic: total order (score desc, id asc) has no
  * ties by construction.
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def lt(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
    if (buf.size >= k && !lt(x, buf.last)) buf
    else ((buf :+ x).sortWith(lt)).take(k)
  }

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    insert(buf, x)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()

  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}
