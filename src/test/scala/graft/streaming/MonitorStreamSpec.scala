package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{Monitor, SparkSpec}

/** Streaming drift-monitor counts vs batch [[Monitor.binnedCounts]]:
  * the SAME declarative (group, bin) aggregate run incrementally must
  * converge to the batch histogram under any batching of exactly-once
  * delivery; under at-least-once re-delivery the counts diverge by
  * exactly the re-emitted rows (bin counts are pure counts — there is
  * no idempotent field in this state). Downstream, the fixed-reference
  * TVD computed from the streaming histogram must flag the planted
  * drift group. */
class MonitorStreamSpec extends SparkSpec {

  // planted: group "shift" moves mass 100 → 5100 cents mid-stream;
  // "stable" alternates throughout
  private def eventRows: Seq[(String, Long)] =
    (0 until 300).map { i =>
      if (i % 2 == 0) ("stable", 100L + (i % 4) / 2 * 5000L)
      else if (i < 150) ("shift", 100L) else ("shift", 5100L)
    }

  test("streaming histogram equals batch under shuffled micro-batches; " +
    "state is one row per (group, bin)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val rows = scala.util.Random.javaRandomToRandom(
      new java.util.Random(29)).shuffle(eventRows)
    val in = MemoryStream[(String, Long)]
    val q = StreamingOps.driftBinCountsStream(
      in.toDF().toDF("event_type", "cents"),
      "event_type", "cents", stepCents = 2500L, nBins = 20)
      .writeStream.format("memory").queryName("drift_t")
      .outputMode("complete").start()
    try {
      val (b1, rest) = rows.splitAt(100)
      val (b2, b3) = rest.splitAt(100)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      in.addData(b3); q.processAllAvailable()

      val stream = spark.table("drift_t")
        .as[(String, Long, Long)].collect().toSet
      val batch = Monitor.binnedCounts(
        eventRows.toDF("event_type", "cents").withColumn("__is_ref", lit(0)),
        "event_type", "cents", "__is_ref", 2500L, 20)
        .drop("n_ref").as[(String, Long, Long)].collect().toSet
      assert(stream == batch)
      assert(stream.size <= 2 * 20) // |groups|·nBins state bound
    } finally q.stop()
  }

  test("at-least-once replay diverges counts by exactly the re-emitted " +
    "rows; fixed-reference TVD still flags only the drifted group") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val rows = eventRows
    val replayed = rows.take(60)
    val in = MemoryStream[(String, Long)]
    val q = StreamingOps.driftBinCountsStream(
      in.toDF().toDF("event_type", "cents"),
      "event_type", "cents", stepCents = 2500L, nBins = 20)
      .writeStream.format("memory").queryName("drift_replay_t")
      .outputMode("complete").start()
    try {
      in.addData(rows); q.processAllAvailable()
      in.addData(replayed); q.processAllAvailable() // source re-emits
      val stream = spark.table("drift_replay_t")
        .as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val batch = Monitor.binnedCounts(
        rows.toDF("event_type", "cents").withColumn("__is_ref", lit(0)),
        "event_type", "cents", "__is_ref", 2500L, 20)
        .drop("n_ref").as[(String, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val replayCounts = replayed
        .map { case (t, c) => (t, math.min(c / 2500, 19)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(stream.keySet == batch.keySet)
      stream.foreach { case (key, n) =>
        assert(n == batch(key) + replayCounts.getOrElse(key, 0L),
          s"$key: count must diverge by exactly the re-emitted rows")
      }

      // downstream: TVD of the (exactly-once) streaming histogram vs a
      // fixed reference histogram (the first half of the plant) flags
      // the drifted group and clears the stable one
      val ref = Monitor.binnedCounts(
        rows.take(150).toDF("event_type", "cents")
          .withColumn("__is_ref", lit(1)),
        "event_type", "cents", "__is_ref", 2500L, 20)
        .select(col("event_type"), col("bin"), col("n_ref"))
      val cur = Monitor.binnedCounts(
        rows.toDF("event_type", "cents").withColumn("__is_ref", lit(0)),
        "event_type", "cents", "__is_ref", 2500L, 20)
        .select(col("event_type"), col("bin"), col("n_cur"))
      val joined = ref.join(cur, Seq("event_type", "bin"), "full_outer")
        .na.fill(0L, Seq("n_ref", "n_cur"))
      val tvd = Monitor.driftStats(joined, "event_type")
        .select("event_type", "tvd").as[(String, Double)].collect().toMap
      assert(tvd("shift") > 0.3, s"drift must be flagged: $tvd")
      assert(tvd("stable") < 0.05, s"stable must stay quiet: $tvd")
    } finally q.stop()
  }

  test("newCategoriesStream fires exactly once per novel category — " +
    "reference vocabulary never fires, at-least-once replay never " +
    "re-fires (idempotent pick, unlike the bin counts)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val ref = Seq("login", "click").toDF("category")
    val t0 = new java.sql.Timestamp(1700000000000L)
    def ev(cat: String, s: Int) =
      (cat, new java.sql.Timestamp(t0.getTime + s * 1000L))

    val in = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingOps.newCategoriesStream(
      in.toDF().toDF("category", "ts"), ref, "category", "ts")
      .writeStream.format("memory").queryName("newcat_t")
      .outputMode("append").start()
    try {
      in.addData(ev("login", 1), ev("click", 2), ev("purchase", 3))
      q.processAllAvailable()
      // known vocabulary silent; the novel category fires once
      assert(spark.table("newcat_t").as[(String, java.sql.Timestamp)]
        .collect().toSeq == Seq(("purchase", ev("purchase", 3)._2)))

      // re-delivery of the SAME novel row + a second occurrence later:
      // neither may re-fire (first-seen is a pick, not a count)
      in.addData(ev("purchase", 3), ev("purchase", 9), ev("refund", 4))
      q.processAllAvailable()
      val out = spark.table("newcat_t")
        .as[(String, java.sql.Timestamp)].collect().sortBy(_._1)
      assert(out.map(_._1).toSeq == Seq("purchase", "refund"))
      assert(out.toMap.apply("purchase") == ev("purchase", 3)._2,
        "the alarm must carry the FIRST occurrence's timestamp")
    } finally q.stop()
  }
}
