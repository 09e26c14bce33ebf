package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregation: keeps the k best (score, id) pairs per
  * group, ordered by (score DESC, id ASC) — exactly `row_number() OVER
  * (ORDER BY score DESC, id)` ≤ k, but as an [[Aggregator]]:
  *
  *  - map-side PARTIAL aggregation: each partition reduces to ≤ k rows
  *    before any shuffle, so a kNN over N corpus rows shuffles
  *    O(partitions·k) instead of sorting N scored rows through a window —
  *    the difference that matters at 100 TB;
  *  - merge is order-independent (top-k selection under a total order),
  *    so results are deterministic regardless of partitioning.
  *
  * Buffer is a sorted List (size ≤ k, k is small by definition). */
final case class ScoredId(score: Double, id: Long)

class TopKAgg(k: Int)
    extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {
  require(k > 0, "k must be positive")

  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  override def zero: List[ScoredId] = Nil

  override def reduce(buf: List[ScoredId], in: ScoredId): List[ScoredId] =
    insert(buf, in)

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
    // buf is sorted by ord and has ≤ k elements
    if (buf.lengthCompare(k) >= 0 && ord.gteq(x, buf.last)) buf
    else {
      val (le, gt) = buf.span(e => ord.lteq(e, x))
      (le ::: x :: gt).take(k)
    }
  }

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
