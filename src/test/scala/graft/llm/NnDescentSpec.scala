package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NN-descent k-NN graph (corpus-vs-corpus retrieval): convergence
  * toward the exact graph on a clustered corpus, the monotone-recall
  * guarantee (per-node lists only ever improve in the (sim, id) total
  * order, so hits against the exact top-k never decrease), determinism
  * under repartitioning, and the per-node output contract. */
class NnDescentSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic clustered corpus: `nClusters` well-separated ±1
    * centers (hash-signed per dim), `perCluster` members each with a
    * small deterministic jitter — near neighbors are cluster-mates by
    * construction. No zero vectors (ANSI divide). */
  private def clustered(nClusters: Int, perCluster: Int, dim: Int = 64) = {
    def h(parts: Long*): Long = {
      var z = 0x9e3779b97f4a7c15L
      parts.foreach { p =>
        z ^= p + 0x9e3779b97f4a7c15L + (z << 6) + (z >>> 2)
        z *= 0xbf58476d1ce4e5b9L; z ^= z >>> 27
      }
      z & Long.MaxValue
    }
    (0 until nClusters).flatMap { c =>
      val center = Array.tabulate(dim)(d =>
        if ((h(c.toLong, d.toLong) & 1L) == 1L) 1.0f else -1.0f)
      (0 until perCluster).map { m =>
        val id = (c * perCluster + m).toLong
        val v = center.zipWithIndex.map { case (x, d) =>
          x + 0.05f * ((h(id, d.toLong, 7L) % 100L) / 100.0f)
        }
        (id, v)
      }
    }.toDF("vec_id", "embedding")
  }

  private def recallVsExact(
      approx: org.apache.spark.sql.DataFrame,
      emb: org.apache.spark.sql.DataFrame, k: Int): Double = {
    val exact = Similarity.bruteForceKnn(emb, emb, "vec_id", "embedding", k)
    val r = Similarity.knnRecall(approx.select("qid", "nid"), exact)
      .agg(sum("n_hits").cast("double") / sum("n_exact"))
      .collect()(0).getDouble(0)
    r
  }

  test("converges toward the exact graph on a clustered corpus, " +
      "monotone in rounds") {
    val emb = clustered(nClusters = 24, perCluster = 9)
    val k = 5
    def run(rounds: Int) =
      Similarity.nnDescentGraph(emb, "vec_id", "embedding", k, rounds)
    val r0 = recallVsExact(run(0), emb, k)
    val r2 = recallVsExact(run(2), emb, k)
    // the LSH warm start is already decent; two local-join rounds must
    // not lose hits (per-node lists improve monotonically) and should
    // close most of the gap on well-separated clusters
    assert(r2 >= r0, s"recall regressed: $r0 -> $r2")
    assert(r2 >= 0.85, s"rounds=2 recall $r2")
  }

  test("output contract: <= k rows per node, ranks 1..k by (sim DESC, " +
      "nid), no self edges") {
    val emb = clustered(nClusters = 8, perCluster = 8)
    val g = Similarity.nnDescentGraph(emb, "vec_id", "embedding",
      k = 4, rounds = 1).collect()
    val byQ = g.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.length <= 4))
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to rows.length))
      // ranks follow raw-sim DESC; the OUTPUT sim is rounded to 6dp
      // (the knn contract), so only non-increasing rounded sims can be
      // asserted — a 6dp tie may be nid-disordered when raw sims differ
      val sims = sorted.map(_.getDouble(3)).toSeq
      assert(sims.zip(sims.tail).forall { case (a, bb) => a >= bb }, s"q=$q")
      assert(rows.forall(_.getLong(1) != q))
    }
  }

  test("deterministic and repartition-invariant") {
    val emb = clustered(nClusters = 10, perCluster = 7)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val a = rows(Similarity.nnDescentGraph(emb, "vec_id", "embedding", 5, 2))
    val b = rows(Similarity.nnDescentGraph(emb.repartition(13),
      "vec_id", "embedding", 5, 2))
    assert(a == b)
  }

  test("nnDescentPlanes: smallest p with 2^p >= N/k, floored at 4") {
    assert(Similarity.nnDescentPlanes(0, 5) == 4)
    assert(Similarity.nnDescentPlanes(80, 5) == 4)    // 16 target
    assert(Similarity.nnDescentPlanes(81, 5) == 4)    // 16 target (div)
    assert(Similarity.nnDescentPlanes(500, 5) == 7)   // 100 -> 2^7
    assert(Similarity.nnDescentPlanes(5000, 5) == 10) // 1000 -> 2^10
  }
}
