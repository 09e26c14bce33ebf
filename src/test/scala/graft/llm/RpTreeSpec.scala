package graft.llm

import graft.SparkSpec

/** RP-tree properties ([[Similarity.trainRpTree]]/[[Similarity.rpTreeKnn]]):
  * median splits balance the leaves (the guarantee LSH buckets lack),
  * training is partitioning-invariant, and in-leaf scoring is exactly
  * the brute-force ranking restricted to the leaf. */
class RpTreeSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random corpus (fixed seed)
  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(42)
    (0L until 256L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
  }
  private def corpus = vecs.toDF("vec_id", "embedding")

  test("depth-3 median splits yield 8 leaves within ±2 of perfect " +
    "balance") {
    val splits = Similarity.trainRpTree(corpus, "vec_id", "embedding",
      depth = 3, dim = 64)
    val sizes = Similarity
      .rpAssignLeaves(corpus, "vec_id", "embedding", splits)
      .groupBy("leaf").count()
      .as[(Long, Long)].collect().toMap
    assert(sizes.keySet.subsetOf((0L until 8L).toSet))
    assert(sizes.size == 8, s"expected 8 populated leaves: $sizes")
    assert(sizes.values.max - sizes.values.min <= 2, sizes.toString)
  }

  test("autoDepth scales with the corpus and mirrors the oracle gates") {
    assert(Similarity.autoDepth(100) == 3)       // depth floor
    assert(Similarity.autoDepth(2048) == 3)      // 256·2^3 ≥ 2048: level 3 off
    assert(Similarity.autoDepth(2049) == 4)      // one past the gate
    assert(Similarity.autoDepth(200000) == 10)
    assert(Similarity.autoDepth(100000000) == 10) // cap
  }

  test("split training is identical under repartitioning") {
    val a = Similarity.trainRpTree(corpus, "vec_id", "embedding", 3, 64)
    val b = Similarity.trainRpTree(corpus.repartition(7), "vec_id",
      "embedding", 3, 64)
    assert(a == b)
  }

  test("sampled training (k < node size) stays deterministic under " +
    "repartitioning and keeps leaves near-balanced") {
    val a = Similarity.trainRpTree(corpus, "vec_id", "embedding", 3, 64,
      sampleK = 64)
    val b = Similarity.trainRpTree(corpus.repartition(11), "vec_id",
      "embedding", 3, 64, sampleK = 64)
    assert(a == b)
    // sample medians carry DKW rank error (ε ≈ 0.15 per split at
    // k = 64) — leaves stay within a generous band of N/8 = 32
    val sizes = Similarity
      .rpAssignLeaves(corpus, "vec_id", "embedding", a)
      .groupBy("leaf").count().as[(Long, Long)].collect().toMap
    assert(sizes.values.forall(s => s >= 8 && s <= 128), sizes.toString)
    assert(sizes.values.sum == 256L)
  }

  test("a 4-tree forest recalls at least as much as the single tree, " +
    "with no duplicate (qid, nid) pairs") {
    val queries = corpus.filter($"vec_id" % 25 === 0)
    val brute = Similarity.bruteForceKnn(corpus, queries, "vec_id",
      "embedding", k = 3)
    def recallOf(ap: org.apache.spark.sql.DataFrame): Double = {
      val r = Similarity.knnRecall(ap, brute)
        .agg(org.apache.spark.sql.functions.sum("n_hits"),
          org.apache.spark.sql.functions.sum("n_exact")).head()
      r.getLong(0).toDouble / r.getLong(1)
    }
    val single = Similarity.rpTreeKnn(corpus, queries, "vec_id",
      "embedding", k = 3,
      splits = Similarity.trainRpTree(corpus, "vec_id", "embedding", 3, 64))
    val forest = Similarity.rpForestKnn(corpus, queries, "vec_id",
      "embedding", k = 3,
      forest = Similarity.trainRpForest(corpus, "vec_id", "embedding",
        nTrees = 4, depth = 3))
    assert(forest.groupBy("qid", "nid").count()
      .filter($"count" > 1).isEmpty, "duplicate pairs across trees")
    val (rs, rf) = (recallOf(single), recallOf(forest))
    assert(rf >= rs, s"forest recall $rf < single-tree recall $rs")
    assert(rf > 0.0)
  }

  test("rpTreeKnn == brute-force ranking restricted to the query's leaf") {
    val splits = Similarity.trainRpTree(corpus, "vec_id", "embedding",
      depth = 3, dim = 64)
    val leaf = Similarity
      .rpAssignLeaves(corpus, "vec_id", "embedding", splits)
      .as[(Long, Long)].collect().toMap
    val queries = corpus.filter($"vec_id" % 50 === 0)
    val got = Similarity.rpTreeKnn(corpus, queries, "vec_id", "embedding",
        k = 3, splits = splits, dim = 64)
      .select("qid", "nid", "rank")
      .as[(Long, Long, Int)].collect().toSet

    val byId = vecs.toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val want = (0L until 256L by 50L).flatMap { qid =>
      val qv = byId(qid)
      val qn = math.sqrt(dot(qv, qv))
      vecs.filter(v => v._1 != qid && leaf(v._1) == leaf(qid))
        .map { case (nid, v) =>
          (nid, dot(qv, v) / (qn * math.sqrt(dot(v, v)))) }
        .sortBy { case (nid, sim) => (-sim, nid) }
        .take(3).zipWithIndex
        .map { case ((nid, _), i) => (qid, nid, i + 1) }
    }.toSet
    assert(got == want)
  }
}
