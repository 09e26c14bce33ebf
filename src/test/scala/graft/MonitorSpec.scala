package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

/** Semantic properties of the drift monitors (the oracle gate proves
  * engine-equivalence; these prove the statistics detect what they
  * claim to detect, on fixtures with PLANTED drift). */
class MonitorSpec extends SparkSpec {
  import spark.implicits._

  private def ts(dayMicros: Long): Timestamp =
    new Timestamp(dayMicros / 1000) // micros → millis

  private val Day = 86400000000L

  /** Two groups over a 2-day span: `shift` moves all mass from cents
    * 100 (day 1) to cents 5100 (day 2); `stable` keeps the identical
    * distribution in both halves. */
  private def fixture = {
    val shift = (0 until 100).map { i =>
      val (t, c) = if (i < 50) (i * Day / 50, 100L)
                   else (Day + (i - 50) * Day / 50, 5100L)
      ("shift", ts(t), c)
    }
    val stable = (0 until 100).map { i =>
      val t = if (i < 50) i * Day / 50 else Day + (i - 50) * Day / 50
      ("stable", ts(t), 100L + (i % 2) * 5000L)
    }
    (shift ++ stable).toDF("event_type", "ts", "cents")
  }

  test("midpoint split halves the fixture exactly; tie goes to current") {
    val tagged = Monitor.midpointSplit(fixture, "ts")
    val byHalf = tagged.groupBy("event_type")
      .agg(sum("__is_ref").as("nr"), sum(lit(1) - col("__is_ref")).as("nc"))
      .as[(String, Long, Long)].collect()
      .map { case (t, nr, nc) => t -> ((nr, nc)) }.toMap
    assert(byHalf == Map("shift" -> ((50L, 50L)), "stable" -> ((50L, 50L))))
    // exact-tie row: 2·t == lo+hi must land in CURRENT (strict <)
    val tie = Seq(("g", ts(0), 1L), ("g", ts(Day), 1L), ("g", ts(2 * Day), 1L))
      .toDF("event_type", "ts", "cents")
    val mid = Monitor.midpointSplit(tie, "ts")
      .filter(unix_micros(col("ts")) === Day)
      .select("__is_ref").as[Int].head()
    assert(mid == 0)
  }

  test("planted total shift maxes TVD and KS; stable group reads zero") {
    val binned = Monitor.binnedCounts(
      Monitor.midpointSplit(fixture, "ts"),
      "event_type", "cents", "__is_ref", stepCents = 2500L, nBins = 20)
    val stats = Monitor.driftStats(binned, "event_type")
      .select("event_type", "tvd", "psi")
      .as[(String, Double, Double)].collect()
      .map { case (t, tvd, psi) => t -> ((tvd, psi)) }.toMap
    assert(stats("shift")._1 == 1.0) // disjoint supports ⇒ TVD = 1 exactly
    assert(stats("stable")._1 == 0.0)
    assert(stats("shift")._2 > 1.0)  // PSI >> 0.25 "major drift" threshold
    assert(stats("stable")._2.abs < 1e-9)

    val vc = Monitor.midpointSplit(fixture, "ts")
      .groupBy(col("event_type"), col("cents").as("value"))
      .agg(sum("__is_ref").cast("long").as("n_ref"),
        sum(lit(1) - col("__is_ref")).cast("long").as("n_cur"))
    val ks = Monitor.ksStat(vc, "event_type")
      .select("event_type", "ks").as[(String, Double)].collect().toMap
    assert(ks("shift") == 1.0)
    assert(ks("stable") == 0.0)
  }

  test("diff_scaled signs point at the bins that gained/lost mass") {
    val binned = Monitor.binnedCounts(
      Monitor.midpointSplit(fixture, "ts"),
      "event_type", "cents", "__is_ref", stepCents = 2500L, nBins = 20)
    val bins = Monitor.driftBins(binned, "event_type")
      .filter(col("event_type") === "shift")
      .select("bin", "diff_scaled").as[(Long, Long)].collect().toMap
    assert(bins(0L) < 0)  // cents 100 → bin 0 lost all its mass
    assert(bins(2L) > 0)  // cents 5100 → bin 2 gained it
  }

  test("ks equals the hand-computed two-sample statistic on random data") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 500).map { i =>
      val c = if (i % 2 == 0) rnd.nextInt(50).toLong
              else 10L + rnd.nextInt(60).toLong // mild planted shift
      ("g", ts(i.toLong * Day / 500), c)
    }
    val df = rows.toDF("event_type", "ts", "cents")
    val vc = Monitor.midpointSplit(df, "ts")
      .groupBy(col("event_type"), col("cents").as("value"))
      .agg(sum("__is_ref").cast("long").as("n_ref"),
        sum(lit(1) - col("__is_ref")).cast("long").as("n_cur"))
    val got = Monitor.ksStat(vc, "event_type")
      .select("ks").as[Double].head()
    // reference: classic ECDF max-gap over the same split
    val lo = 0L
    val hi = rows.map(r => r._2.getTime * 1000).max
    val (ref, cur) = rows.partition(r => r._2.getTime * 1000 * 2 < lo + hi)
    val values = rows.map(_._3).distinct.sorted
    val expect = values.map { v =>
      val er = ref.count(_._3 <= v).toDouble / ref.size
      val ec = cur.count(_._3 <= v).toDouble / cur.size
      math.abs(er - ec)
    }.max
    assert(math.abs(got - expect) < 1e-12)
  }

  test("newCategories flags only post-reference vocabulary") {
    val rows =
      (0 until 20).map(i => ("old", ts(i * Day / 20))) ++      // day 1
      (0 until 20).map(i => ("old", ts(Day + i * Day / 20))) ++ // day 2
      Seq(("novel", ts(Day + Day / 2)), ("novel", ts(Day + Day / 3)))
    val df = rows.toDF("category", "ts")
    val out = Monitor.newCategories(
      Monitor.headDaysSplit(df, "ts", days = 1),
      "category", "__is_ref", "ts")
      .select("category", "n_cur").as[(String, Long)].collect().toMap
    assert(out == Map("novel" -> 2L))
  }

  test("degenerate split (one side empty) yields NULL tvd/psi/ks " +
    "sentinels, not an ANSI divide-by-zero crash (ADVICE r13)") {
    // one distinct timestamp: lo == hi, 2·t < lo+hi is false for every
    // row ⇒ N_ref = 0 for the whole group
    val df = Seq(("g", ts(Day), 100L), ("g", ts(Day), 200L))
      .toDF("event_type", "ts", "cents")
    val tagged = Monitor.midpointSplit(df, "ts")
    val stats = Monitor.driftStats(
      Monitor.binnedCounts(tagged, "event_type", "cents", "__is_ref",
        stepCents = 2500L, nBins = 20),
      "event_type")
      .select("n_ref", "n_cur", "tvd_scaled", "tvd", "psi").collect().head
    assert(stats.getLong(0) == 0L && stats.getLong(1) == 2L)
    assert(stats.getLong(2) == 0L) // exact integer form stays defined
    assert(stats.isNullAt(3) && stats.isNullAt(4))

    val vc = tagged.groupBy(col("event_type"), col("cents").as("value"))
      .agg(sum("__is_ref").cast("long").as("n_ref"),
        sum(lit(1) - col("__is_ref")).cast("long").as("n_cur"))
    val ks = Monitor.ksStat(vc, "event_type")
      .select("ks_scaled", "ks").collect().head
    assert(ks.getLong(0) == 0L && ks.isNullAt(1))
  }
}
