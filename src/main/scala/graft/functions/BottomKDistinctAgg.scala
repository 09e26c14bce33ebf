package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded bottom-k DISTINCT aggregation over longs — the KMV sketch
  * register set ([[graft.llm.Sketches.kmvSetOps]]) as an [[Aggregator]]:
  *
  *  - map-side partial aggregation: every partition reduces to ≤ k
  *    values before the shuffle (O(partitions·k) shuffled rows at any
  *    input size);
  *  - merge is order-independent AND idempotent: bottom-k-distinct of a
  *    multiset ignores both ordering and repetition, so the maintained
  *    state is exactly right for at-least-once streaming — a replayed
  *    element re-inserts as a no-op (the same argument that makes the
  *    HLL register max replay-safe);
  *  - buffer is an ascending sorted List of ≤ k distinct values.
  */
class BottomKDistinctAgg(k: Int)
    extends Aggregator[Long, List[Long], Seq[Long]] {
  require(k > 0, "k must be positive")

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], x: Long): List[Long] = insert(buf, x)

  override def merge(a: List[Long], b: List[Long]): List[Long] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[Long], x: Long): List[Long] = {
    if (buf.lengthCompare(k) >= 0 && x >= buf.last) buf
    else {
      val (lt, ge) = buf.span(_ < x)
      if (ge.headOption.contains(x)) buf // distinct: present is a no-op
      else (lt ::: x :: ge).take(k)
    }
  }

  override def finish(buf: List[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
