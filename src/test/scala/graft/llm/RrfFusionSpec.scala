package graft.llm

import graft.SparkSpec

/** Semantic properties of reciprocal-rank fusion (the oracle gate
  * proves engine-equivalence of the full hybrid query; these prove the
  * fusion rule itself on hand-built rank lists). */
class RrfFusionSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(rows: (Long, Long, Int)*) =
    rows.toDF("qid", "nid", "rank")

  test("a doc on both lists outranks same-rank docs on one list") {
    // dense: docs 1,2 at ranks 1,2 — sparse: docs 1,3 at ranks 1,2.
    // doc 1 (rank 1 + rank 1) must fuse above both single-list docs.
    val fused = Similarity.rrfFuse(
      ranks((10L, 1L, 1), (10L, 2L, 2)),
      ranks((10L, 1L, 1), (10L, 3L, 2)), k = 10)
      .select("nid", "rank").as[(Long, Int)].collect().toMap
    assert(fused(1L) == 1)
    assert(Set(fused(2L), fused(3L)) == Set(2, 3))
  }

  test("union semantics: single-list docs survive with a null twin rank") {
    val out = Similarity.rrfFuse(
      ranks((1L, 100L, 1)), ranks((1L, 200L, 1)), k = 10)
    val m = out.select("nid", "r_dense", "r_sparse")
      .as[(Long, Option[Int], Option[Int])].collect()
      .map { case (n, d, s) => n -> ((d, s)) }.toMap
    assert(m(100L) == ((Some(1), None)))
    assert(m(200L) == ((None, Some(1))))
  }

  test("scaled scores are the exact rounded reciprocal sums") {
    val out = Similarity.rrfFuse(
      ranks((1L, 5L, 3)), ranks((1L, 5L, 7)), k = 10)
      .select("rrf_scaled").as[Long].head()
    val expect = math.round(1e9 / 63) + math.round(1e9 / 67)
    assert(out == expect)
  }

  test("tie on fused score breaks to the lower doc id, ranks contiguous") {
    // docs 7 and 9 both appear only on dense at rank 1/2 vs sparse 2/1 —
    // symmetric scores ⇒ tie ⇒ nid order
    val fused = Similarity.rrfFuse(
      ranks((1L, 9L, 1), (1L, 7L, 2)),
      ranks((1L, 7L, 1), (1L, 9L, 2)), k = 10)
      .select("nid", "rank").as[(Long, Int)].collect().toMap
    assert(fused(7L) == 1 && fused(9L) == 2)
  }
}
