package graft

import org.apache.spark.sql.functions._

import graft.llm.Sampling

/** Winsorization and the permille-rank cut machinery: cuts are the exact
  * ⌈p·n/1000⌉-th order statistics per group, clamping matches an
  * in-memory reference, and the cuts are invariant to bin width and
  * partitioning. */
class WinsorizeSpec extends SparkSpec {
  import spark.implicits._

  // two groups with different shapes, duplicate values included
  private val data: Seq[(String, Long)] =
    (1L to 200L).map(i => ("g1", i * 10)) ++
      (1L to 57L).map(i => ("g2", (i % 9) * 1000)) ++
      Seq(("g2", 999999L)) // one extreme outlier

  private def refCut(vs: Seq[Long], p: Int): Long = {
    val sorted = vs.sorted
    val pos = (p.toLong * vs.size + 999) / 1000 // ceil(p·n/1000)
    sorted((pos - 1).toInt)
  }

  test("cuts are the exact permille order statistics") {
    val df = data.toDF("g", "v")
    val got = Sampling.groupPermilleCuts(df, "g", "v",
        Seq(50, 500, 950, 1000), binWidth = 700L)
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((g, vs) <- data.groupBy(_._1).view.mapValues(_.map(_._2));
         p <- Seq(50, 500, 950, 1000))
      assert(got((g, p)) == refCut(vs, p), s"g=$g p=$p")
  }

  test("winsorize clamps exactly to the reference cuts, rows keep identity") {
    val df = data.zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val got = Anomaly.winsorize(df, "g", "v", 50, 950, binWidth = 300L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    val cuts = data.groupBy(_._1).view
      .mapValues(vs => (refCut(vs.map(_._2), 50), refCut(vs.map(_._2), 950)))
      .toMap
    data.zipWithIndex.foreach { case ((g, v), i) =>
      val (lo, hi) = cuts(g)
      val (gotV, gotW) = got(i.toLong)
      assert(gotV == v && gotW == math.min(math.max(v, lo), hi))
    }
    // the planted outlier really was clamped
    assert(got.values.exists { case (v, w) => v == 999999L && w < v })
  }

  test("cuts are invariant to bin width and partitioning") {
    val df = data.toDF("g", "v")
    def cuts(bw: Long, parts: Int) =
      Sampling.groupPermilleCuts(df.repartition(parts), "g", "v",
          Seq(10, 990), bw)
        .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2))
        .toMap
    val base = cuts(1000L, 4)
    assert(cuts(7L, 4) == base)
    assert(cuts(100000L, 11) == base)
  }
}
