package graft

import graft.queries.CoreQueries

/** x_quantiles vs driver-side sorted-array ground truth: the
  * value-frequency formulation must reproduce percentile_disc exactly. */
class QuantilesSpec extends SparkSpec {

  test("value-frequency quantiles equal sorted-array percentile_disc") {
    val dir = sf("sf0.001")
    val got = CoreQueries.queries("x_quantiles")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val byFlag = Tables.read(spark, dir, "lineitem")
      .select("l_returnflag", "l_extendedprice")
      .collect()
      .map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).map { case (f, a) => f -> a.map(_._2).sorted }
    assert(byFlag.nonEmpty && got.size == byFlag.size * 5)
    for ((flag, sortedVals) <- byFlag; q <- Seq(0.25, 0.5, 0.75, 0.9, 0.99)) {
      val pos = math.ceil(q * sortedVals.length).toLong
      val expected = sortedVals((pos - 1).toInt)
      assert(got((flag, q)) == expected,
        s"flag=$flag q=$q: got ${got((flag, q))}, expected $expected")
    }
  }

  test("histogram brackets contain the exact quantiles") {
    val dir = sf("sf0.001")
    val exact = CoreQueries.queries("x_quantiles")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    val approx = CoreQueries.queries("x_quantiles_approx")(spark, dir)
      .collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val key = (r.getString(0), r.getDouble(1))
      val (lo, hi) = (r.getAs[Double]("est_lo"), r.getAs[Double]("est_hi"))
      assert(lo <= exact(key) && exact(key) < hi,
        s"$key: exact ${exact(key)} outside bracket [$lo, $hi)")
    }
  }
}
