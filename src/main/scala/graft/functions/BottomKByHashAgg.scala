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
  * The sample is DISTINCT on the (hash, value) pair — a present pair
  * re-inserts as a no-op. Row identities hash apart (32-bit, distinct
  * rowIds), so this still samples ROWS, not values: two equal values
  * from different rows are two sample points under their two hashes;
  * only a literally re-delivered row collapses. That makes the register
  * set IDEMPOTENT under replay — an at-least-once stream maintains
  * exactly the batch sample
  * ([[graft.streaming.StreamingOps.quantileSampleStream]],
  * QuantileStreamSpec) — the same argument as the KMV registers.
  *
  * Rank-error guarantee (DKW over a uniform k-sample): every quantile
  * of the sample is within rank error ε = sqrt(ln(2/δ)/(2k)) of the
  * population quantile with probability 1-δ — k=1024 gives ε ≈ 0.051 at
  * δ = 1% (tighter in practice: sampling is without replacement).
  * State: ≤ k (long, double) pairs per group, at any input size.
  *
  * Buffer = two PRIMITIVE parallel arrays (hashes, values), ascending
  * by (h, v) so the worst kept pair sits at the END: rejecting a row
  * when the buffer is full and the row hashes above the current k-th
  * smallest is O(1); only the ~k·ln(n/k) accepted rows pay the O(k)
  * insertion copy. The round-6 form carried an `(Int, List[HashedVal])`
  * buffer whose ExpressionEncoder walked a linked list and encoded a
  * struct per element on every partial-buffer serde — the sf0.1 serde
  * constant the round-6 verdict flagged on `x_quantiles_sketch`; array
  * encoders take the flat primitive-copy path. */
final case class HashedVal(h: Long, v: Double)

class BottomKByHashAgg(k: Int)
    extends Aggregator[HashedVal, (Array[Long], Array[Double]), Seq[HashedVal]] {
  require(k > 0, "k must be positive")

  /** Strict (h1, v1) < (h2, v2) under (h ASC, v ASC); Double.compare so
    * NaN/-0.0 order exactly as the round-6 Ordering did. */
  private def less(h1: Long, v1: Double, h2: Long, v2: Double): Boolean =
    h1 < h2 || (h1 == h2 && java.lang.Double.compare(v1, v2) < 0)

  override def zero: (Array[Long], Array[Double]) =
    (Array.emptyLongArray, Array.emptyDoubleArray)

  override def reduce(
      buf: (Array[Long], Array[Double]),
      x: HashedVal): (Array[Long], Array[Double]) =
    insert(buf, x.h, x.v)

  override def merge(
      a: (Array[Long], Array[Double]),
      b: (Array[Long], Array[Double])): (Array[Long], Array[Double]) = {
    var acc = a
    var i = 0
    while (i < b._1.length) { acc = insert(acc, b._1(i), b._2(i)); i += 1 }
    acc
  }

  private def insert(
      buf: (Array[Long], Array[Double]),
      h: Long, v: Double): (Array[Long], Array[Double]) = {
    val (hs, vs) = buf
    val n = hs.length
    // full and not below the current worst → O(1) reject (covers the
    // exact-equal-to-worst replay case too)
    if (n >= k && !less(h, v, hs(n - 1), vs(n - 1))) buf
    else {
      var i = 0
      while (i < n && less(hs(i), vs(i), h, v)) i += 1
      if (i < n && hs(i) == h &&
          java.lang.Double.compare(vs(i), v) == 0) buf // replay no-op
      else {
        val m = math.min(n + 1, k)
        val nh = new Array[Long](m)
        val nv = new Array[Double](m)
        System.arraycopy(hs, 0, nh, 0, i)
        System.arraycopy(vs, 0, nv, 0, i)
        nh(i) = h
        nv(i) = v
        val rest = m - i - 1
        if (rest > 0) {
          // when full, the displaced worst (the old last element) drops
          System.arraycopy(hs, i, nh, i + 1, rest)
          System.arraycopy(vs, i, nv, i + 1, rest)
        }
        (nh, nv)
      }
    }
  }

  override def finish(buf: (Array[Long], Array[Double])): Seq[HashedVal] =
    buf._1.indices.map(i => HashedVal(buf._1(i), buf._2(i)))

  override def bufferEncoder: Encoder[(Array[Long], Array[Double])] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Array[Long], Array[Double])]()

  override def outputEncoder: Encoder[Seq[HashedVal]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedVal]]()
}
