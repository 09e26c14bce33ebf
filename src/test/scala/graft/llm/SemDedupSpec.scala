package graft.llm

import graft.SparkSpec

/** SemDeDup keep-rule semantics: within a duplicate group the LOWEST
  * centroid-similarity member survives (NOT the smallest id — the
  * contrast with dropNearDuplicatesByEmbedding), singletons always
  * survive, and the result is repartition-invariant. */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // one fixed centroid at e1, so centroid_sim is just each vector's
  // cosine against (1, 0): v1 = 1.0 > v2 ≈ 0.99 > v3 ≈ 0.90 — all three
  // are pairwise-similar above tau, so the group must keep v3 (the most
  // atypical), while the min-id rule would keep v1. v4 points away
  // (negative cosine to all) — a singleton that must survive untouched.
  private val cents = IndexedSeq(Seq(1.0, 0.0))
  private def corpus = Seq(
    (1L, Seq(1.0, 0.0), "a"),
    (2L, Seq(0.99, 0.141), "b"),
    (3L, Seq(0.9, 0.436), "c"),
    (4L, Seq(-1.0, 0.1), "d")).toDF("vec_id", "embedding", "label")

  test("the lowest-centroid-similarity member survives its group") {
    val kept = Similarity.semDedup(corpus, "vec_id", "embedding",
        tau = 0.8, centroids = Some(cents))
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(3L, 4L))
  }

  test("min-id dedup keeps a different exemplar on the same corpus") {
    val kept = Similarity.dropNearDuplicatesByEmbedding(
        corpus, "vec_id", "embedding", tau = 0.8,
        centroids = Some(cents))
      .select("vec_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 4L))
  }

  test("survivors are repartition-invariant on real embeddings") {
    val e = graft.Tables.read(spark, sf("sf0.001"), "embeddings")
    val a = Similarity.semDedup(e, "vec_id", "embedding", tau = 0.4)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Similarity.semDedup(e.repartition(11), "vec_id", "embedding",
        tau = 0.4)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
