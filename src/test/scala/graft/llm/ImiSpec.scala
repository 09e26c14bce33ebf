package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Inverted multi-index properties ([[Similarity.trainImiQuantizers]] /
  * [[Similarity.imiKnn]] / [[graft.functions.ImiTopPairs]]): codebook
  * sizing is the exact integer cube-root search, training is
  * partitioning-invariant, the multi-sequence probe order equals a
  * brute enumeration of the pair grid, candidate sets nest in `nPairs`
  * (so recall is monotone in the probe ramp), and the pruned read
  * changes nothing. */
class ImiSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(19)
    (0L until 512L).map(i =>
      (i, Array.fill(64)(rnd.nextGaussian().toFloat)))
  }
  private def corpus = vecs.toDF("vec_id", "embedding")
  private def queries = corpus.filter(col("vec_id") % 64 === 0)

  test("defaultKHalf is the smallest k with k^3 >= N, floored at 8") {
    assert(Similarity.defaultKHalf(1) == 8)
    assert(Similarity.defaultKHalf(512) == 8)
    assert(Similarity.defaultKHalf(513) == 9)
    assert(Similarity.defaultKHalf(2000) == 13)   // 13^3 = 2197
    assert(Similarity.defaultKHalf(2197) == 13)
    assert(Similarity.defaultKHalf(2198) == 14)
    assert(Similarity.defaultKHalf(20000000) == 272) // 272^3 = 20123648
  }

  test("half-codebook training is identical under repartitioning") {
    val a = Similarity.trainImiQuantizers(corpus, "vec_id", "embedding",
      kHalf = 8)
    val b = Similarity.trainImiQuantizers(corpus.repartition(7), "vec_id",
      "embedding", kHalf = 8)
    assert(a == b)
  }

  test("multi-sequence probe cells equal the brute pair-grid ranking") {
    val (ca, cb) = Similarity.trainImiQuantizers(corpus, "vec_id",
      "embedding", kHalf = 8)
    val kh = ca.length
    // reference: score every (cellA, cellB) pair per query by the same
    // quantized-cosine fold, sort by (sum desc, product cell desc)
    def qsim(v: Array[Double], c: Seq[Double]): Double = {
      val vn = math.sqrt(v.foldLeft(0.0)((s, x) => s + x * x))
      val cn = math.sqrt(c.foldLeft(0.0)((s, x) => s + x * x))
      var acc = 0.0
      var i = 0
      while (i < c.length) { acc += v(i) * c(i); i += 1 }
      acc / (vn * cn)
    }
    val nPairs = 8
    val expected: Map[Long, Seq[Int]] = vecs.filter(_._1 % 64 == 0).map {
      case (id, emb) =>
        val qd = emb.map(x => math.floor(x.toDouble * 1048576.0))
        val (va, vb) = (qd.take(32), qd.drop(32))
        val grid = for {
          i <- ca.indices; j <- cb.indices
        } yield (qsim(va, ca(i)) + qsim(vb, cb(j)), i * kh + j)
        id -> grid.sortBy { case (s, c) => (-s, -c) }
          .take(nPairs).map(_._2)
    }.toMap
    // the operator's probe set per query: candidates' cells must equal
    // the expected top pairs intersected with populated cells — assert
    // via the exposed expression directly
    import org.apache.spark.sql.GraftSql
    val withNorm = (v: IndexedSeq[Seq[Double]]) =>
      v.map(c => math.sqrt(c.foldLeft(0.0)((s, x) => s + x * x)))
    val pc = GraftSql.column(graft.functions.ImiTopPairs(
      GraftSql.expression(expr(
        "transform(slice(embedding, 1, 32), x -> cast(floor(cast(x as double) * 1048576.0) as double))")),
      GraftSql.expression(expr(
        "sqrt(aggregate(transform(slice(embedding, 1, 32), x -> cast(floor(cast(x as double) * 1048576.0) as double)), cast(0.0 as double), (a, x) -> a + x * x))")),
      GraftSql.expression(expr(
        "transform(slice(embedding, 33, 32), x -> cast(floor(cast(x as double) * 1048576.0) as double))")),
      GraftSql.expression(expr(
        "sqrt(aggregate(transform(slice(embedding, 33, 32), x -> cast(floor(cast(x as double) * 1048576.0) as double)), cast(0.0 as double), (a, x) -> a + x * x))")),
      ca, withNorm(ca), cb, withNorm(cb), nPairs))
    val got = queries.select(col("vec_id"), pc.as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    expected.foreach { case (id, cells) =>
      assert(got(id) == cells, s"query $id probe order mismatch")
    }
  }

  test("candidate sets nest in nPairs, so recall is monotone along " +
    "the probe ramp") {
    def hits(nPairs: Int): Map[(Long, Long), Int] =
      Similarity.imiKnn(corpus, queries, "vec_id", "embedding",
          k = 5, kHalf = 8, nPairs = nPairs)
        .select(col("qid"), col("nid"))
        .as[(Long, Long)].collect().map(_ -> 1).toMap
    val exact = Similarity.bruteForceKnn(corpus, queries, "vec_id",
        "embedding", k = 5)
      .select(col("qid"), col("nid")).as[(Long, Long)].collect()
    def recall(h: Map[(Long, Long), Int]): Double =
      exact.count(h.contains).toDouble / exact.length
    val r = Seq(2, 8, 32).map(p => recall(hits(p)))
    assert(r == r.sorted, s"recall not monotone along the ramp: $r")
    assert(r.last > r.head, s"the ramp should buy recall: $r")
  }

  test("pruned and unpruned multi-index retrieval are identical") {
    def run(prune: Boolean) =
      Similarity.imiKnn(corpus, queries, "vec_id", "embedding",
          k = 5, kHalf = 8, nPairs = 8, pruneCells = prune)
        .orderBy("qid", "rank").select("qid", "nid", "rank")
        .as[(Long, Long, Int)].collect().toSeq
    assert(run(prune = true) == run(prune = false))
  }
}
