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
  * The sample is DISTINCT on the (hash, value) pair — like
  * [[BottomKDistinctAgg]], a present pair re-inserts as a no-op. Row
  * identities hash apart (32-bit, distinct rowIds), so this still
  * samples ROWS, not values: two equal values from different rows are
  * two sample points under their two hashes; only a literally
  * re-delivered row collapses. That makes the register set IDEMPOTENT
  * under replay — an at-least-once stream maintains exactly the batch
  * sample ([[graft.streaming.StreamingOps.quantileSampleStream]],
  * QuantileStreamSpec) — the same argument as the KMV registers.
  *
  * Rank-error guarantee (DKW over a uniform k-sample): every quantile
  * of the sample is within rank error ε = sqrt(ln(2/δ)/(2k)) of the
  * population quantile with probability 1-δ — k=1024 gives ε ≈ 0.051 at
  * δ = 1% (tighter in practice: sampling is without replacement).
  * State: ≤ k (long, double) pairs per group, at any input size.
  */
final case class HashedVal(h: Long, v: Double)

class BottomKByHashAgg(k: Int)
    extends Aggregator[HashedVal, (Int, List[HashedVal]), Seq[HashedVal]] {
  require(k > 0, "k must be positive")

  private val ord: Ordering[HashedVal] =
    Ordering.by((s: HashedVal) => (s.h, s.v))

  // Buffer = (size, list sorted DESCENDING by ord — worst pair first).
  // Size is tracked (List.lengthCompare is O(k)) and the worst element
  // sits at the HEAD, so the hot path — rejecting a row when the buffer
  // is full and the row hashes above the current k-th smallest — is
  // O(1). k = 1024 made the naive ascending-list form (O(k) last/length
  // walks per REJECTED row) the bench's slowest query at sf0.1; with
  // O(1) rejection only the ~k·ln(n/k) accepted rows pay the O(k) walk.
  override def zero: (Int, List[HashedVal]) = (0, Nil)

  override def reduce(
      buf: (Int, List[HashedVal]), x: HashedVal): (Int, List[HashedVal]) =
    insert(buf, x)

  override def merge(
      a: (Int, List[HashedVal]),
      b: (Int, List[HashedVal])): (Int, List[HashedVal]) =
    b._2.foldLeft(a)(insert)

  private def insert(
      buf: (Int, List[HashedVal]), x: HashedVal): (Int, List[HashedVal]) = {
    val (n, lst) = buf
    if (n >= k && ord.gteq(x, lst.head)) buf // O(1) reject on the worst
    else {
      val (gt, le) = lst.span(e => ord.gt(e, x))
      if (le.headOption.exists(e => ord.equiv(e, x))) buf // replay no-op
      else {
        val merged = gt ::: x :: le
        if (n + 1 > k) (k, merged.tail) // drop the displaced worst (head)
        else (n + 1, merged)
      }
    }
  }

  override def finish(buf: (Int, List[HashedVal])): Seq[HashedVal] =
    buf._2.reverse // ascending, as consumers expect

  override def bufferEncoder: Encoder[(Int, List[HashedVal])] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Int, List[HashedVal])]()

  override def outputEncoder: Encoder[Seq[HashedVal]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HashedVal]]()
}
