package graft.llm

import graft.SparkSpec

/** Seeded randomized sweeps over the sketch guarantees: HLL error
  * bounds, CMS's overestimate-only property, and KMV's exact-vs-estimate
  * branch behavior — on key distributions the fixture suites don't
  * enumerate (skew, tiny universes, disjoint and nested label sets).
  * Seeds are fixed — a failure reproduces exactly. */
class SketchPropertySpec extends SparkSpec {
  import spark.implicits._

  test("HLL stays within 4 sigma across random cardinalities and skew") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val nDistinct = 1 + rnd.nextInt(20000)
      // zipf-ish repetition: row count up to 3x distinct
      val keys = Seq.tabulate(nDistinct + rnd.nextInt(2 * nDistinct + 1)) {
        i => s"s$seed-k${i % nDistinct}"
      }
      val row = Sketches.hllDistinct(keys.toDF("k"), "k").head()
      val exact = row.getAs[Long]("n_exact").toDouble
      val est = row.getAs[Double]("est_hll")
      assert(exact == nDistinct.toDouble)
      val sigma = 1.04 / math.sqrt(Sketches.HllM) * exact
      // linear-counting regime is much tighter; 4 sigma covers both
      assert(math.abs(est - exact) <= math.max(4 * sigma, 8.0),
        s"seed $seed: est $est exact $exact")
    }
  }

  test("CMS never undercounts on random skewed frequency tables") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(100 + seed)
      val nKeys = 1 + rnd.nextInt(3000)
      val rows = Seq.tabulate(5000) { _ =>
        // quadratic skew toward low key ids
        val u = rnd.nextDouble()
        s"s$seed-k${(u * u * nKeys).toInt}"
      }
      val out = Sketches.cmsTopK(rows.toDF("k"), "k", 15).collect()
      out.foreach { r =>
        assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_true"),
          s"seed $seed undercounted ${r.get(0)}")
      }
    }
  }

  test("KMV set estimates respect exact branches and error bounds") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(200 + seed)
      val nA = 1 + rnd.nextInt(4000)
      val nB = 1 + rnd.nextInt(4000)
      val overlap = rnd.nextInt(math.min(nA, nB) + 1)
      val a = (0 until nA).map(i => ("a", s"s$seed-k$i"))
      val b = (nA - overlap until nA - overlap + nB)
        .map(i => ("b", s"s$seed-k$i"))
      val row = Sketches.kmvSetOps((a ++ b).toDF("lab", "key"),
        "key", "lab", "a", "b").head()
      val k = Sketches.KmvK
      val tol = 4.0 / math.sqrt(k - 2)
      def check(est: Double, exact: Long, what: String): Unit =
        if (exact < k) assert(est == exact.toDouble,
          s"seed $seed $what: small set must be exact ($est vs $exact)")
        else assert(math.abs(est - exact) / exact < tol,
          s"seed $seed $what: $est vs $exact")
      check(row.getAs[Double]("est_a"), row.getAs[Long]("n_exact_a"), "A")
      check(row.getAs[Double]("est_b"), row.getAs[Long]("n_exact_b"), "B")
      check(row.getAs[Double]("est_union"),
        row.getAs[Long]("n_exact_union"), "union")
      assert(row.getAs[Long]("n_exact_inter") == overlap.toLong)
    }
  }
}
