package graft

import org.apache.spark.sql.functions._

import graft.llm.Sketches
import graft.queries.CoreQueries

/** The mergeable quantile sketch's three contracts:
  * determinism under repartitioning (merge-order invariance — what lets
  * the estimates through the driver's hash gate), the DKW rank-error
  * bound vs ground truth, and exactness on groups that fit the sample.
  */
class QuantileSketchSpec extends SparkSpec {

  private val Qs = Seq(0.25, 0.5, 0.75, 0.9, 0.99)

  /** rank of `v` in sorted `vals` as a fraction (percentile_disc rank of
    * the largest position holding a value ≤ v). */
  private def rankFrac(vals: Array[Double], v: Double): Double = {
    val n = vals.count(_ <= v)
    n.toDouble / vals.length
  }

  test("sketch is invariant under repartitioning (merge order)") {
    val dir = sf("sf0.001")
    val li = Tables.read(spark, dir, "lineitem")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketches.quantileSketchBy(df, Seq("l_returnflag"), "l_extendedprice",
        concat(col("l_orderkey").cast("string"), lit("_"),
          col("l_linenumber").cast("string")), Qs, k = 256)
        .collect().map(_.toString).sorted.toSeq
    assert(run(li) == run(li.repartition(13)))
    assert(run(li) == run(li.repartition(1)))
  }

  test("estimates satisfy the DKW rank-error bound vs ground truth") {
    val dir = sf("sf0.001")
    val rows = CoreQueries.queries("x_quantiles_sketch")(spark, dir).collect()
    val byFlag = Tables.read(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (f, a) => f -> a.map(_._2).sorted }
    assert(rows.length == byFlag.size * Qs.size)
    // k = 1024 → eps = sqrt(ln(2/δ)/2k) ≈ 0.051 at δ=1%; the data is
    // fixed and the sketch deterministic, so the assertion is stable.
    // 0.06 leaves margin while still failing on any real sampling bug.
    val eps = 0.06
    rows.foreach { r =>
      val (flag, q) = (r.getString(0), r.getDouble(1))
      val est = r.getAs[Double]("est_value")
      val fr = rankFrac(byFlag(flag), est)
      assert(math.abs(fr - q) <= eps,
        s"flag=$flag q=$q: est $est has rank $fr (|Δ| > $eps)")
      assert(r.getAs[Long]("n_rows") == byFlag(flag).length)
    }
  }

  test("groups that fit the sample get EXACT percentile_disc values") {
    import spark.implicits._
    // two groups, 100 rows each, k=128 > group size → complete sample
    val df = (1 to 100).flatMap(i =>
      Seq(("a", i, i.toDouble), ("b", i, (1000 - i).toDouble)))
      .toDF("g", "id", "v")
    val got = Sketches.quantileSketchBy(
      df, Seq("g"), "v", concat(col("g"), col("id").cast("string")),
      Qs, k = 128)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getAs[Double]("est_value"), r.getAs[Long]("sample_n")))
      .toMap
    for (g <- Seq("a", "b"); q <- Qs) {
      val vals = (1 to 100).map(i =>
        if (g == "a") i.toDouble else (1000 - i).toDouble).sorted
      val expected = vals(math.ceil(q * 100).toInt - 1)
      val (est, sampleN) = got((g, q))
      assert(sampleN == 100L)
      assert(est == expected, s"g=$g q=$q: $est != $expected")
    }
  }

  test("seeded sweep: bound holds across distributions and k") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val dists: Seq[(String, Int => Double)] = Seq(
      ("uniform", _ => rnd.nextDouble() * 1000),
      ("zipf-ish", _ => 1.0 / (rnd.nextDouble() + 1e-4)),
      ("bimodal", i => if (i % 2 == 0) rnd.nextGaussian()
                       else 500 + rnd.nextGaussian()))
    for ((name, gen) <- dists; k <- Seq(256, 1024)) {
      val data = (1 to 20000).map(i => (i, gen(i)))
      val df = data.toDF("id", "v")
      val eps = 3.0 * math.sqrt(1.0 / (2 * k)) // ~3σ of the DKW radius
      val sorted = data.map(_._2).sorted.toArray
      Sketches.quantileSketchBy(
        df, Nil, "v", col("id").cast("string"), Qs, k)
        .collect().foreach { r =>
          val q = r.getAs[Double]("q")
          val fr = rankFrac(sorted, r.getAs[Double]("est_value"))
          assert(math.abs(fr - q) <= eps,
            s"$name k=$k q=$q: rank $fr off by > $eps")
        }
    }
  }
}
