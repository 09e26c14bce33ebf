package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Johnson–Lindenstrauss ±1 random projection: exact replayability from
  * the shared plane literals, and the distance-preservation property the
  * operator exists for. */
class ProjectionSpec extends SparkSpec {

  test("projection replays bit-for-bit from the plane literals") {
    val e = graft.Tables.read(spark, sf(), "embeddings")
    val got = Similarity.randomProject(e, "vec_id", "embedding", dOut = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2))
      .toMap
    val signs = Similarity.planeSigns(16, 64)
    val scale = 1.0 / math.sqrt(16.0)
    val want = e.select("vec_id", "embedding").collect().flatMap { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble)
      signs.zipWithIndex.map { case (row, j) =>
        val d = (0 until 64).foldLeft(0.0)((a, i) => a + v(i) * row(i))
        (id, j) -> BigDecimal(d * scale)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    }.toMap
    assert(got == want && got.nonEmpty)
  }

  test("pairwise distances are broadly preserved at 64 -> 16") {
    val e = graft.Tables.read(spark, sf(), "embeddings")
      .filter(col("vec_id") < 200)
    val orig = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = Similarity.randomProject(e, "vec_id", "embedding", dOut = 16)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getDouble(2)) }
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ids = orig.keys.toSeq.sorted
    val pairs = for (i <- ids.indices; j <- i + 1 until ids.length)
      yield (d2(orig(ids(i)).toSeq, orig(ids(j)).toSeq),
        d2(proj(ids(i)).toSeq, proj(ids(j)).toSeq))
    // The JL guarantee is CONCENTRATION of the distortion ratio
    // d²_proj/d²_orig around 1 (E[d²_proj] = d²_orig for ±1 planes) —
    // NOT rank correlation, which is vacuous on this corpus: in 64-dim
    // near-uniform data all pairwise distances concentrate to the same
    // value, so d² has almost no variance to correlate
    val ratios = pairs.map { case (o, p) => p / o }
    val mean = ratios.sum / ratios.size
    val inBand = ratios.count(r => r > 0.5 && r < 2.0).toDouble / ratios.size
    assert(mean > 0.85 && mean < 1.15, s"mean distortion = $mean")
    assert(inBand > 0.9, s"fraction within [0.5, 2.0] = $inBand")
  }
}
