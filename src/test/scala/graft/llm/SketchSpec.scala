package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Sketch guarantees that the hash-exact oracle can't express:
  * HyperLogLog error bounds and partitioning invariance, Count-Min's
  * overestimate-only property, Bloom's no-false-negative property. */
class SketchSpec extends SparkSpec {

  private def lineitem = Tables.read(spark, sf("sf0.001"), "lineitem")

  test("HLL estimate lands within 3 standard errors of the exact count") {
    val row = Sketches.hllDistinct(lineitem, "l_orderkey").head()
    val exact = row.getAs[Long]("n_exact").toDouble
    val est = row.getAs[Double]("est_hll")
    // sigma = 1.04/sqrt(m) relative standard error for HLL
    val sigma = 1.04 / math.sqrt(Sketches.HllM) * exact
    assert(math.abs(est - exact) <= 3 * sigma,
      s"est $est vs exact $exact (3sigma ${3 * sigma})")
  }

  test("HLL registers are partitioning-invariant (max is order-free)") {
    val a = Sketches.hllDistinct(lineitem, "l_orderkey").head()
    val b = Sketches.hllDistinct(lineitem.repartition(13), "l_orderkey").head()
    assert(a == b)
  }

  test("HLL ignores NULL keys, matching countDistinct semantics") {
    import spark.implicits._
    val data = (1 to 200).map(i => s"k$i").toDF("k")
    val withNulls = data.union(
      Seq.fill(25)(null.asInstanceOf[String]).toDF("k"))
    // identical register tables → identical estimate; before the NULL
    // filter a (bucket=NULL, m=NULL) row skewed the denominator by one
    // empty bucket (ADVICE r5)
    assert(Sketches.hllDistinct(withNulls, "k").head() ==
      Sketches.hllDistinct(data, "k").head())
  }

  test("HLL switches to linear counting on tiny cardinalities") {
    import spark.implicits._
    val tiny = (1 to 40).map(i => s"k$i").toDF("k")
    val row = Sketches.hllDistinct(tiny, "k").head()
    assert(row.getAs[String]("method") == "linear")
    val est = row.getAs[Double]("est_hll")
    // linear counting is near-exact at n << m
    assert(math.abs(est - 40.0) <= 4.0, s"linear est $est for n=40")
  }

  test("KMV set ops: exact when sets fit the sketch, bounded error beyond") {
    import spark.implicits._
    // small regime: both sets < k → sketches are complete → all exact
    val small = ((1 to 100).map(i => ("a", s"k$i")) ++
      (51 to 150).map(i => ("b", s"k$i"))).toDF("lab", "key")
    val sRow = Sketches.kmvSetOps(small, "key", "lab", "a", "b").head()
    assert(sRow.getAs[Double]("est_a") == 100.0)
    assert(sRow.getAs[Double]("est_b") == 100.0)
    assert(sRow.getAs[Double]("est_union") == 150.0)
    assert(sRow.getAs[Double]("est_inter") == 50.0)
    assert(sRow.getAs[Long]("n_exact_inter") == 50L)

    // estimator regime: |A|=4000, |B|=3000, overlap 2000
    val big = ((1 to 4000).map(i => ("a", s"k$i")) ++
      (2001 to 5000).map(i => ("b", s"k$i"))).toDF("lab", "key")
    val row = Sketches.kmvSetOps(big, "key", "lab", "a", "b").head()
    def relErr(est: Double, exact: Long) = math.abs(est - exact) / exact
    // 3 standard errors at k=256: 3/sqrt(k-2) ≈ 0.188
    val tol = 3.0 / math.sqrt(Sketches.KmvK - 2)
    assert(relErr(row.getAs[Double]("est_a"), 4000) < tol)
    assert(relErr(row.getAs[Double]("est_b"), 3000) < tol)
    assert(relErr(row.getAs[Double]("est_union"), 5000) < tol)
    // intersection compounds union and Jaccard noise — allow 2× the tol
    assert(relErr(row.getAs[Double]("est_inter"), 2000) < 2 * tol)

    // repartition invariance (bottom-k of a distinct hash set is
    // order-free)
    val again = Sketches.kmvSetOps(big.repartition(13), "key", "lab", "a", "b")
      .head()
    assert(again == row)
  }

  test("Count-Min never undercounts, and is exact absent collisions") {
    val rows = Sketches.cmsTopK(lineitem, "l_partkey", 20).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_true"),
        s"CMS undercounted ${r.get(0)}")
    }
    // 20 distinct keys into 4x512 buckets: collisions are impossible to
    // ENGINEER away in general, but a tiny universe must come back exact
    import spark.implicits._
    val tiny = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq("c")
    val exact = Sketches.cmsTopK(tiny.toDF("k"), "k", 3).collect()
    assert(exact.map(r => (r.getAs[String]("key"), r.getAs[Long]("n_est")))
      .toSeq == Seq(("a", 7L), ("b", 3L), ("c", 1L)))
  }

  test("Bloom prefilter passes every true match (no false negatives)") {
    val orders = Tables.read(spark, sf("sf0.001"), "orders")
    val build = Tables.read(spark, sf("sf0.001"), "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val row = Sketches.bloomSemiJoinStats(
      orders, "o_custkey", build, "c_custkey").head()
    val nExact = row.getAs[Long]("n_exact")
    val nPass = row.getAs[Long]("n_bloom_pass")
    val nFp = row.getAs[Long]("n_false_pos")
    assert(nPass >= nExact, "bloom dropped a true match")
    assert(nFp == nPass - nExact)
    // ~0.8% expected fpp for a ~60-key build side at sf0.001; 10% is the
    // "something is broken" alarm threshold, not a precision target
    val nonMatch = row.getAs[Long]("n_probe") - nExact
    assert(nonMatch == 0 || nFp.toDouble / nonMatch < 0.10,
      s"false-positive rate ${nFp.toDouble / nonMatch}")
  }

  test("Bloom bitset itself admits every build key") {
    // probe the filter WITH its own build side: zero false negatives
    // means every build key must pass
    val build = Tables.read(spark, sf("sf0.001"), "customer")
      .filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey"))
    val row = Sketches.bloomSemiJoinStats(
      build.withColumnRenamed("c_custkey", "k"), "k",
      build, "c_custkey").head()
    assert(row.getAs[Long]("n_bloom_pass") == row.getAs[Long]("n_probe"))
    assert(row.getAs[Long]("n_false_pos") == 0L)
  }
}
