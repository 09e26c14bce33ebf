package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded uniform row sample: keeps the k rows with the SMALLEST
  * (hash, value) pairs per group — bottom-k selection over a portable
  * per-row hash, i.e. a deterministic uniform sample without
  * replacement (Cohen & Kaplan's bottom-k sampling), feeding the
  * mergeable quantile sketch [[graft.llm.Sketches.quantileSketchBy]].
  *
  * Why bottom-k-by-hash and not KLL/GK: all three are one-pass, bounded
  * state, map-side combinable; but KLL's compactions and GK's band
  * merges make the OUTPUT depend on merge order, which Spark does not
  * fix (task completion order varies run to run). Bottom-k selection
  * under a total order is merge-order INVARIANT — the same property
  * that makes [[TopKAgg]] and the KMV registers deterministic — so the
  * sketch's estimates are reproducible across partitionings, engines
  * and replays (an at-least-once re-delivery re-inserts an already
  * present pair, which [[reduce]] keeps as a duplicate only if the pair
  * genuinely appears twice in the data — row identities hash apart).
  *
  * Unlike [[BottomKDistinctAgg]] this keeps DUPLICATE pairs: the sample
  * is of rows (multiset), not of distinct values — two equal values
  * from different rows are two sample points, exactly as
  * `row_number() OVER (ORDER BY h, v) <= k` would keep them.
  *
  * Rank-error guarantee (DKW over a uniform k-sample): every quantile
  * of the sample is within rank error ε = sqrt(ln(2/δ)/(2k)) of the
  * population quantile with probability 1-δ — k=1024 gives ε ≈ 0.051 at
  * δ = 1% (tighter in practice: sampling is without replacement).
  * State: ≤ k (long, double) pairs per group, at any input size.
  */
final case class HashedVal(h: Long, v: Double)

class BottomKByHashAgg(k: Int)
    extends Aggregator[HashedVal, List[HashedVal], Seq[HashedVal]] {
  require(k > 0, "k must be positive")

  private val ord: Ordering[HashedVal] =
    Ordering.by((s: HashedVal) => (s.h, s.v))

  override def zero: List[HashedVal] = Nil

  override def reduce(buf: List[HashedVal], x: HashedVal): List[HashedVal] =
    insert(buf, x)

  override def merge(a: List[HashedVal], b: List[HashedVal]): List[HashedVal] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[HashedVal], x: HashedVal): List[HashedVal] = {
    // buf is sorted by ord and has ≤ k elements
    if (buf.lengthCompare(k) >= 0 && ord.gteq(x, buf.last)) buf
    else {
      val (le, gt) = buf.span(e => ord.lteq(e, x))
      (le ::: x :: gt).take(k)
    }
  }

  override def finish(buf: List[HashedVal]): Seq[HashedVal] = buf

  override def bufferEncoder: Encoder[List[HashedVal]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[HashedVal]]()

  override def outputEncoder: Encoder[Seq[HashedVal]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedVal]]()
}
