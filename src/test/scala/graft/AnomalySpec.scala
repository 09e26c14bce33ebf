package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the exact-integer z-score outlier detector
  * (the oracle gate proves engine-equivalence; these prove it flags what
  * it claims to flag). */
class AnomalySpec extends SparkSpec {
  import spark.implicits._

  test("planted outlier is flagged; tight cluster and edges are not") {
    // group A: 20 values at 100±1 cents plus one at 10000 — the only 3σ
    // outlier; group B: constant (σ=0, nothing can be flagged); group C:
    // a single row (n=1, nothing to compare against)
    val a = (1L to 20L).map(i => ("a", i, 100L + (i % 3) - 1)) :+
      (("a", 99L, 10000L))
    val b = (1L to 10L).map(i => ("b", 100 + i, 500L))
    val c = Seq(("c", 200L, 123456L))
    val df = (a ++ b ++ c).toDF("grp", "id", "cents")
    val out = Anomaly.zscoreOutliers(df, Seq("grp"), "cents")
      .select("grp", "id").as[(String, Long)].collect().toSet
    assert(out == Set(("a", 99L)))
  }

  test("flag set equals a double-precision z-score reference on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 400L).map { i =>
      val grp = s"g${i % 8}"
      // mostly tight around a per-group mean, occasional wild value
      val v = if (rnd.nextInt(40) == 0) rnd.nextInt(100000).toLong
              else 1000L * (i % 8) + rnd.nextInt(20)
      (grp, i, v)
    }
    val df = rows.toDF("grp", "id", "cents")
    val got = Anomaly.zscoreOutliers(df, Seq("grp"), "cents")
      .select("id").as[Long].collect().toSet
    val expect = rows.groupBy(_._1).flatMap { case (_, g) =>
      val n = g.size.toDouble
      val mu = g.map(_._3).sum / n
      val sig = math.sqrt(g.map(r => (r._3 - mu) * (r._3 - mu)).sum / n)
      g.filter(r => math.abs(r._3 - mu) > 3 * sig).map(_._2)
    }.toSet
    assert(got == expect)
  }

  test("values past the exact-Long bound fail loudly, not silently") {
    // n·max(|c|) beyond √(Long.Max/9) ≈ 1.01e9 would wrap the integer
    // test silently; the inline assert_true guard must raise instead
    val df = (1L to 10L).map(i => ("g", i, 400000000L * i))
      .toDF("grp", "id", "cents")
    val e = intercept[Exception] {
      Anomaly.zscoreOutliers(df, Seq("grp"), "cents").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("exact-Long bound")), msgs(e).mkString("|"))
  }

  test("caller columns named like the temp columns survive untouched") {
    // 20 tight values + 1 extreme (a lone value in n=4 can never clear
    // 3σ — the sample-max z is (n−1)/√n)
    val rows0 = (1L to 20L).map(i => ("a", i, 100L + (i % 3) - 1, "keep")) :+
      (("a", 99L, 10000L, "keep"))
    val df = rows0.toDF("grp", "id", "cents", "__zs_n")
    val out = Anomaly.zscoreOutliers(df, Seq("grp"), "cents")
    assert(out.columns.toSeq == Seq("grp", "id", "cents", "__zs_n"))
    val rows = out.collect()
    assert(rows.map(_.getAs[Long]("id")).toSet == Set(99L))
    assert(rows.forall(_.getAs[String]("__zs_n") == "keep"))
  }

  test("guard pass and sum pass share ONE shuffle (same window spec)") {
    val df = (1L to 50L).map(i => ("g" + i % 5, i, i % 97))
      .toDF("grp", "id", "cents")
    val plan = Anomaly.zscoreOutliers(df, Seq("grp"), "cents")
      .queryExecution.executedPlan.toString
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(nExchanges == 1, s"expected 1 window shuffle, got $nExchanges:\n$plan")
  }

  test("result is repartition-invariant (exact integers, no FP order)") {
    val rows = (1L to 300L).map(i => ("g" + i % 5, i, (i * i * 7) % 90001))
    val df = rows.toDF("grp", "id", "cents")
    val one = Anomaly.zscoreOutliers(df.repartition(1), Seq("grp"), "cents")
      .select("id").as[Long].collect().toSet
    val many = Anomaly.zscoreOutliers(df.repartition(13), Seq("grp"), "cents")
      .select("id").as[Long].collect().toSet
    assert(one == many)
  }
}
