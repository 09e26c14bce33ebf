package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Fractional-epoch upsampling: exact copy counts per row (floor +
  * hash-picked extra), per-group totals, absent-group drop, the epoch
  * index contract, and the zero-shuffle claim. */
class EpochsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 300L).map(i =>
    (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))

  test("integer epochs replicate exactly; absent groups drop") {
    val df = rows.toDF("id", "g")
    val got = Sampling.epochsUpsample(df, "id", "g",
      Seq(("a", 3L, 1L), ("b", 1L, 1L)), "s")
    val byG = got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byG == Map("a" -> 300L, "b" -> 100L)) // c dropped entirely
    // epoch indexes are exactly 0..copies-1 per row
    val eps = got.filter(col("g") === "a").groupBy("id")
      .agg(sort_array(collect_list("epoch")).as("e"))
      .collect().map(_.getSeq[Long](1))
    assert(eps.forall(_ == Seq(0L, 1L, 2L)))
  }

  test("fractional epochs: copies = floor + hash pick, exact per row") {
    val df = rows.toDF("id", "g")
    val got = Sampling.epochsUpsample(df, "id", "g",
      Seq(("a", 5L, 2L), ("b", 1L, 2L), ("c", 0L, 2L)), "s")
      .groupBy("id", "g").count().collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // independent reference: the same hash32 predicate
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(4).map("%02x".format(_)).mkString, 16)
    }
    rows.foreach { case (id, g) =>
      val (n, d) = g match {
        case "a" => (5L, 2L); case "b" => (1L, 2L); case _ => (0L, 2L)
      }
      val want = n / d + (if (h(id) % d < n % d) 1L else 0L)
      assert(got.getOrElse((id, g), 0L) == want, s"id=$id g=$g")
    }
    // group c (0/2 epochs) contributes at most the hash-picked nothing:
    // 0 div 2 = 0 and 0 % 2 = 0 ⇒ no rows at all
    assert(!got.keys.exists(_._2 == "c"))
  }

  test("expected copies are num/den exactly in aggregate (law of the hash)") {
    val df = (1L to 2000L).map((_, "x")).toDF("id", "g")
    val n = Sampling.epochsUpsample(df, "id", "g",
      Seq(("x", 7L, 4L)), "s2").count()
    // 7/4 = 1.75 ⇒ 3500 ± hash noise; the pick is Bernoulli(3/4) per id
    assert(math.abs(n - 3500L) < 150, s"got $n")
  }

  test("the plan has no shuffle (broadcast table + map-side explode)") {
    val df = rows.toDF("id", "g")
    val plan = Sampling.epochsUpsample(df, "id", "g",
      Seq(("a", 3L, 2L)), "s").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
