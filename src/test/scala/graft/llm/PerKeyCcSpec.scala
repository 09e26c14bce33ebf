package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Dedup.connectedComponentsPerKey]] must be OUTPUT-IDENTICAL to the
  * general iterative [[Dedup.connectedComponents]] whenever its
  * precondition holds (every edge confined to one bucket) — that
  * equivalence is what lets the embedding-dedup path swap 14 rounds of
  * label propagation for one union-find pass without touching the
  * oracle. */
class PerKeyCcSpec extends SparkSpec {

  private def h(a: Long, b: Long): Long = {
    var x = a * 0x9e3779b97f4a7c15L + b
    x ^= x >>> 27; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 31
    x & Long.MaxValue
  }

  test("per-key union-find equals iterative CC on cell-confined graphs") {
    import spark.implicits._
    // 40 cells; nodes 0..999 assigned cell = id % 40; random intra-cell
    // edges with chains, cliques, self-contained pairs and isolated nodes
    val edges = (0 until 3000).flatMap { i =>
      val cell = (i % 40).toLong
      val a = cell + 40L * (h(i.toLong, 1) % 25)
      val b = cell + 40L * (h(i.toLong, 2) % 25)
      if (a == b) None else Some((cell, math.min(a, b), math.max(a, b)))
    }.distinct
    val df = edges.toDF("cell", "id_a", "id_b").repartition(7)

    val perKey = Dedup.connectedComponentsPerKey(df, "id_a", "id_b", "cell")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val general = Dedup.connectedComponents(df, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perKey == general)
    // sanity: non-trivial graph (some real merges happened)
    assert(perKey.nonEmpty && perKey.exists { case (k, v) => k != v })
  }

  test("per-key output is partitioning-invariant") {
    import spark.implicits._
    val edges = (0 until 500).map { i =>
      ((i % 10).toLong, (i % 97).toLong * 10 + (i % 10),
        (h(i.toLong, 3) % 97).toLong * 10 + (i % 10))
    }.filter { case (_, a, b) => a != b }
      .map { case (c, a, b) => (c, math.min(a, b), math.max(a, b)) }
      .distinct
    def run(parts: Int): Map[Long, Long] =
      Dedup.connectedComponentsPerKey(
        edges.toDF("cell", "id_a", "id_b").repartition(parts),
        "id_a", "id_b", "cell")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == run(13))
  }

  test("non-integral ids are rejected with guidance") {
    import spark.implicits._
    val df = Seq((1L, "a", "b")).toDF("cell", "id_a", "id_b")
    val e = intercept[IllegalArgumentException](
      Dedup.connectedComponentsPerKey(df, "id_a", "id_b", "cell"))
    assert(e.getMessage.contains("integral"))
  }
}
