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
  * are deterministic on any partitioning. */
final case class ScoredTerm(score: Double, term: String)

class TopKTermsAgg(k: Int)
    extends Aggregator[ScoredTerm, List[ScoredTerm], Seq[ScoredTerm]] {
  require(k > 0, "k must be positive")

  private val ord: Ordering[ScoredTerm] =
    Ordering.by((s: ScoredTerm) => (-s.score, s.term))

  override def zero: List[ScoredTerm] = Nil

  override def reduce(buf: List[ScoredTerm], in: ScoredTerm): List[ScoredTerm] =
    insert(buf, in)

  override def merge(a: List[ScoredTerm], b: List[ScoredTerm]): List[ScoredTerm] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[ScoredTerm], x: ScoredTerm): List[ScoredTerm] = {
    // buf is sorted by ord and has ≤ k elements
    if (buf.lengthCompare(k) >= 0 && ord.gteq(x, buf.last)) buf
    else {
      val (le, gt) = buf.span(e => ord.lteq(e, x))
      (le ::: x :: gt).take(k)
    }
  }

  override def finish(buf: List[ScoredTerm]): Seq[ScoredTerm] = buf

  override def bufferEncoder: Encoder[List[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[ScoredTerm]]()

  override def outputEncoder: Encoder[Seq[ScoredTerm]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredTerm]]()
}
