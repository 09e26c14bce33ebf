package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Multi-table LSH: the L-table index exists to BUY RECALL (a true
  * neighbor is missed only if every table separates it from the query),
  * so the spec proves exactly that on a corpus with genuine angular
  * cluster structure — plus the (qid, nid) dedup contract across
  * tables. */
class MultiTableLshSpec extends SparkSpec {

  private val Dim = 16

  /** 20 tight angular clusters × 30 members, deterministic: member
    * vectors are a ±1 "center" plus small per-member jitter, so
    * same-cluster cosines sit near 1 and cross-cluster near 0 — the
    * structure hyperplane LSH indexes. */
  private def clustered: DataFrame = {
    import spark.implicits._
    def h(a: Long, b: Long): Long = {
      var x = a * 0x9e3779b97f4a7c15L + b
      x ^= x >>> 27; x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 31
      x & Long.MaxValue
    }
    (0 until 600).map { i =>
      val c = i / 30
      val v = (0 until Dim).map { d =>
        val center = if ((h(c.toLong, d.toLong) & 1L) == 1L) 1.0f else -1.0f
        center + (h(i.toLong, d.toLong + 100) % 100L) / 500.0f
      }
      (i.toLong, v, c)
    }.toDF("vec_id", "embedding", "label")
  }

  private def avgRecall(nTables: Int): Double = {
    val e = clustered
    val q = e.filter(col("vec_id") % 30 === 0) // one query per cluster
    val approx = Similarity.lshKnnMultiTable(
      e, q, "vec_id", "embedding", k = 5,
      nPlanes = 8, nTables = nTables, dim = Dim)
    val exact = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 5)
    val r = Similarity.knnRecall(approx, exact)
      .agg(avg("recall")).collect()(0).getDouble(0)
    r
  }

  test("4 tables recall >= 1 table recall on clustered data, and useful") {
    val r1 = avgRecall(1)
    val r4 = avgRecall(4)
    assert(r4 >= r1, s"multi-table recall $r4 < single-table $r1")
    assert(r4 > 0.5, s"4-table recall $r4 not useful on clustered corpus")
  }

  test("candidates found by several tables collapse to one ranked row") {
    val e = clustered
    val q = e.filter(col("vec_id") === 0)
    val out = Similarity.lshKnnMultiTable(
      e, q, "vec_id", "embedding", k = 5,
      nPlanes = 4, nTables = 4, dim = Dim).collect()
    // tight clusters + 4 coarse tables ⇒ near neighbors land in several
    // tables; output must still be one row per (qid, nid), ranks 1..k
    val pairs = out.toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length, "duplicate (qid,nid) rows")
    val ranks = out.toSeq.map(_.getAs[Number](2).longValue).sorted
    assert(ranks == (1L to out.length.toLong).toSeq,
      "ranks not contiguous from 1")
  }
}
