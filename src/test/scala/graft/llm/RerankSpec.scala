package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Two-stage projected-candidate ANN and quality-keeping dedup:
  * properties the DuckDB oracle replays but can't PROVE — full-overfetch
  * rerank collapses to the exact baseline, and the cluster winner is the
  * quality argmax, not the smallest id. */
class RerankSpec extends SparkSpec {

  test("project+rerank with full overfetch equals brute force exactly") {
    val e = Tables.read(spark, sf(), "embeddings")
      .filter(col("vec_id") < 300)
    val q = e.filter(col("vec_id") % 50 === 0)
    // m >= |corpus| makes stage 1 select EVERY candidate, so stage 2's
    // exact cosine over the survivors IS the brute-force computation —
    // ranks and sims must match bit-for-bit
    val rr = Similarity.projectRerankKnn(
      e, q, "vec_id", "embedding", k = 5, m = 400)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rank"),
        r.getAs[Double]("sim"))).toSet
    val br = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Long]("rank"),
        r.getAs[Double]("sim"))).toSet
    assert(rr == br && rr.nonEmpty)
  }

  test("ivfPqRerank reports exact cosines and beats/equals raw ADC order") {
    val e = Tables.read(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val rr = Similarity.ivfPqRerankKnn(
      e, q, "vec_id", "embedding", k = 5, shortlistFactor = 4)
    // stage 2's REPORTED sim must equal the full-float exact cosine for
    // every returned pair (re-rank never approximates the score)
    val bruteAll = Similarity.bruteForceKnn(e, q, "vec_id", "embedding",
        k = 200).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("sim"))).toMap
    val rows = rr.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      bruteAll.get(key).foreach(bs =>
        assert(bs == r.getAs[Double]("sim"), s"sim mismatch for $key"))
    }
    // within each query, ranks must follow exact sim descending — the
    // ADC ordering may not survive stage 2, the exact ordering must
    rows.groupBy(_.getLong(0)).values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Number]("rank").longValue)
        .map(_.getAs[Double]("sim"))
      assert(byRank.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    }
  }

  test("project+rerank sims are exact cosines; overfetch is the recall lever") {
    val e = Tables.read(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") % 100 === 0)
    val brute = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 5)
    val rr = Similarity.projectRerankKnn(
      e, q, "vec_id", "embedding", k = 5, m = 20)
    // whatever neighbors stage 1 selects, the REPORTED sim must equal
    // the full-width exact cosine (re-rank never approximates the score)
    val bruteAll = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 50)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Double]("sim"))).toMap
    rr.collect().foreach { r =>
      val k = (r.getLong(0), r.getLong(1))
      bruteAll.get(k).foreach(bs =>
        assert(bs == r.getAs[Double]("sim"), s"sim mismatch for $k"))
    }
    // this corpus is near-uniform in 64-dim (ProjectionSpec), so tight
    // top-5 neighbors are the HARDEST case for any lossy selector —
    // the contract is (a) far better than random candidate selection
    // (random m=20 of N≈6k would land recall ≈ m/N < 0.01) and (b)
    // recall grows monotonically with the overfetch m toward test 1's
    // exactness at m = N
    def recallAt(m: Int): Double = Similarity.knnRecall(
      Similarity.projectRerankKnn(e, q, "vec_id", "embedding", k = 5, m = m),
      brute).agg(avg("recall")).collect()(0).getDouble(0)
    val r20 = recallAt(20)
    val r200 = recallAt(200)
    assert(r20 >= 0.1, s"project+rerank recall@5 (m=20) = $r20")
    assert(r200 > r20 && r200 >= 0.5,
      s"overfetch must raise recall: m=20 -> $r20, m=200 -> $r200")
  }

  test("keepBestPerCluster keeps the quality argmax, ties to lowest id") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val alt = "completely different text about keeping the best cluster member"
    val df = Seq(
      // cluster A: 3 exact dups — quality says keep 12 (highest score,
      // HIGHER id than the min-id rule would pick)
      (10L, base), (11L, base), (12L, base),
      // cluster B: exact pair with a TIED quality score -> lowest id 20
      (20L, alt), (21L, alt),
      (99L, "an unrelated singleton document with no duplicate partner at all")
    ).toDF("doc_id", "text")
    val scores = Seq(
      (10L, 0.3), (11L, 0.5), (12L, 0.9),
      (20L, 0.7), (21L, 0.7),
      (99L, 0.1)
    ).toDF("doc_id", "quality")
    val pairs = Dedup.jaccardShinglePairs(df, "doc_id", "text", 3, 0.5)
    val kept = Dedup.keepBestPerCluster(pairs, df, "doc_id", "text", scores)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 20L, 99L), s"kept = $kept")
    // min-id semantics would have kept 10 — prove the two operators differ
    val minId = Dedup.dropNearDuplicatesFromPairs(pairs, df, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(minId == Set(10L, 20L, 99L), s"min-id kept = $minId")
  }
}
