package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k over (score, term) pairs — [[TopKAgg]]'s ordering
  * contract (`score DESC, id ASC`) for STRING-identified items, built
  * for the per-document TF-IDF head: every partition reduces a doc's
  * term list to ≤ k entries before the shuffle, replacing a
  * partition-by-doc window sort of the full doc-term relation (the
  * r5 scale probe's superlinear term in text_tfidf). Merge is
  * order-independent top-k selection under a total order, so results
  * are deterministic on any partitioning.
  *
  * Buffer = two PRIMITIVE parallel arrays (scores, terms), sorted best
  * first, never longer than k. The round-6 form carried a
  * `List[ScoredTerm]` buffer whose ExpressionEncoder walked a linked
  * list and encoded a struct per element on every partial-buffer
  * serde — measured as the 3× sf0.1 constant regression the round-6
  * verdict flagged; array encoders take the flat copy path. Rejection
  * of an outranked row stays O(1) (compare against the current k-th);
  * only accepted rows pay the O(k) insertion copy. */
final case class ScoredTerm(score: Double, term: String)

class TopKTermsAgg(k: Int)
    extends Aggregator[ScoredTerm, (Array[Double], Array[String]), Seq[ScoredTerm]] {
  require(k > 0, "k must be positive")

  /** Strict "x outranks y" under (score DESC, term ASC). */
  private def outranks(xs: Double, xt: String, ys: Double, yt: String): Boolean =
    java.lang.Double.compare(xs, ys) > 0 ||
      (java.lang.Double.compare(xs, ys) == 0 && xt.compareTo(yt) < 0)

  override def zero: (Array[Double], Array[String]) =
    (Array.emptyDoubleArray, Array.empty[String])

  override def reduce(
      buf: (Array[Double], Array[String]),
      in: ScoredTerm): (Array[Double], Array[String]) =
    insert(buf, in.score, in.term)

  override def merge(
      a: (Array[Double], Array[String]),
      b: (Array[Double], Array[String])): (Array[Double], Array[String]) = {
    var acc = a
    var i = 0
    while (i < b._1.length) { acc = insert(acc, b._1(i), b._2(i)); i += 1 }
    acc
  }

  private def insert(
      buf: (Array[Double], Array[String]),
      score: Double, term: String): (Array[Double], Array[String]) = {
    val (s, t) = buf
    val n = s.length
    // full and not better than the current k-th → O(1) reject
    if (n >= k && !outranks(score, term, s(n - 1), t(n - 1))) buf
    else {
      var i = 0
      while (i < n && !outranks(score, term, s(i), t(i))) i += 1
      val m = math.min(n + 1, k)
      val ns = new Array[Double](m)
      val nt = new Array[String](m)
      System.arraycopy(s, 0, ns, 0, i)
      System.arraycopy(t, 0, nt, 0, i)
      ns(i) = score
      nt(i) = term
      val rest = m - i - 1
      if (rest > 0) {
        System.arraycopy(s, i, ns, i + 1, rest)
        System.arraycopy(t, i, nt, i + 1, rest)
      }
      (ns, nt)
    }
  }

  override def finish(buf: (Array[Double], Array[String])): Seq[ScoredTerm] =
    buf._1.indices.map(i => ScoredTerm(buf._1(i), buf._2(i)))

  override def bufferEncoder: Encoder[(Array[Double], Array[String])] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[(Array[Double], Array[String])]()

  override def outputEncoder: Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
}
