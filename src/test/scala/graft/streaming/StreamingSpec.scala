package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StreamingOps.KeyedEvent

/** Streaming semantics driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("pointsInIntervalsStream == batch interval join on out-of-order delivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val intervals = Seq(
      (100L, Timestamp.valueOf("2024-01-01 10:00:00"),
        Timestamp.valueOf("2024-01-01 10:30:00")),
      (200L, Timestamp.valueOf("2024-01-01 10:20:00"),
        Timestamp.valueOf("2024-01-01 12:00:00"))
    ).toDF("window_id", "ws", "we")
    val in = MemoryStream[(Long, Timestamp)]
    val q = StreamingOps.pointsInIntervalsStream(
        in.toDF().toDF("pid", "pts"), "pts", intervals, "ws", "we",
        bucketSeconds = 600)
      .select("pid", "window_id")
      .writeStream.format("memory").queryName("iv_t")
      .outputMode("append").start()
    try {
      // out of order across micro-batches — stateless join must not care
      in.addData((1L, ts(25)), (2L, ts(45)))
      q.processAllAvailable()
      in.addData((3L, ts(5)), (4L, ts(30)), (5L, Timestamp.valueOf("2024-01-01 09:59:00")))
      q.processAllAvailable()
      val got = spark.table("iv_t")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch reference over the same points
      val pts = Seq((1L, ts(25)), (2L, ts(45)), (3L, ts(5)), (4L, ts(30)),
        (5L, Timestamp.valueOf("2024-01-01 09:59:00"))).toDF("pid", "pts")
      val want = graft.IntervalJoin.pointInInterval(
          pts, "pts", intervals, "ws", "we", bucketSeconds = 600)
        .select("pid", "window_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want &&
        got == Set((1L, 100L), (1L, 200L), (2L, 200L), (3L, 100L), (4L, 200L)))
    } finally q.stop()
  }

  test("latestPerKey state holds the newest event across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = StreamingOps.latestPerKey(in.toDS())
      .writeStream.format("memory").queryName("latest_t")
      .outputMode("update").start()
    try {
      in.addData(KeyedEvent(1, ts(5), 10.0), KeyedEvent(2, ts(6), 20.0))
      q.processAllAvailable()
      // batch 2: an OLDER event for key 1 must NOT displace the state,
      // a newer one for key 2 must
      in.addData(KeyedEvent(1, ts(1), 99.0), KeyedEvent(2, ts(9), 25.0))
      q.processAllAvailable()
      val rows = spark.table("latest_t").as[KeyedEvent].collect()
        .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.ts.getTime) }
      assert(rows(1L).value == 10.0 && rows(1L).ts == ts(5))
      assert(rows(2L).value == 25.0 && rows(2L).ts == ts(9))
    } finally q.stop()
  }

  test("windowedCounts aggregates per entity-window with watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = StreamingOps.windowedCounts(
      in.toDF(), "ts", "user_id", "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("wins_t")
      .outputMode("update").start()
    try {
      in.addData(
        KeyedEvent(1, ts(1), 1), KeyedEvent(1, ts(2), 2),
        KeyedEvent(1, ts(11), 3), KeyedEvent(2, ts(3), 4))
      q.processAllAvailable()
      val got = spark.table("wins_t")
        .selectExpr("user_id", "n_events").as[(Long, Long)].collect().toSet
      assert(got.contains((1L, 2L))) // window [10:00,10:10): two events
      assert(got.contains((1L, 1L))) // window [10:10,10:20)
      assert(got.contains((2L, 1L)))
    } finally q.stop()
  }

  test("enrichAsOf attaches latest static feature per streaming entity row") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val features = Seq(
      (1L, ts(0), 10.0), (1L, ts(10), 11.0), // key 1: two versions
      (2L, ts(30), 20.0))                    // key 2: only AFTER the entity ts
      .toDF("user_id", "fts", "conv")
    val in = MemoryStream[KeyedEvent] // (user_id, ts, value) as entity rows
    val q = StreamingOps.enrichAsOf(
      in.toDF(), features, Seq("user_id"), "ts", "fts", Seq("conv"),
      ttlSeconds = 0, watermark = "0 seconds")
      .writeStream.format("memory").queryName("asof_t")
      .outputMode("append").start()
    try {
      in.addData(
        KeyedEvent(1, ts(5), 1.0),   // → conv 10.0 (ts(0) is latest ≤ 10:05)
        KeyedEvent(1, ts(15), 2.0),  // → conv 11.0
        KeyedEvent(2, ts(5), 3.0))   // → NULL (feature is in the future)
      q.processAllAvailable()
      // advance the watermark past ts(15) so append mode finalizes all rows
      in.addData(KeyedEvent(9, ts(50), 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_t")
        .selectExpr("user_id", "cast(ts as string)", "conv")
        .as[(Long, String, Option[Double])].collect()
        .map { case (k, t, c) => (k, t.substring(11, 16), c) }.toSet
      assert(got.contains((1L, "10:05", Some(10.0))))
      assert(got.contains((1L, "10:15", Some(11.0))))
      assert(got.contains((2L, "10:05", None)))
    } finally q.stop()
  }

  test("enrichAsOf honors the TTL lower bound") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val features = Seq((1L, ts(0), 10.0)).toDF("user_id", "fts", "conv")
    val in = MemoryStream[KeyedEvent]
    val q = StreamingOps.enrichAsOf(
      in.toDF(), features, Seq("user_id"), "ts", "fts", Seq("conv"),
      ttlSeconds = 300, watermark = "0 seconds") // 5-minute TTL
      .writeStream.format("memory").queryName("asof_ttl_t")
      .outputMode("append").start()
    try {
      in.addData(
        KeyedEvent(1, ts(4), 1.0),  // within TTL → 10.0
        KeyedEvent(1, ts(9), 2.0))  // 9 min after the feature → expired
      q.processAllAvailable()
      in.addData(KeyedEvent(9, ts(50), 0.0))
      q.processAllAvailable()
      val got = spark.table("asof_ttl_t")
        .selectExpr("user_id", "cast(ts as string)", "conv")
        .as[(Long, String, Option[Double])].collect()
        .map { case (k, t, c) => (k, t.substring(11, 16), c) }.toSet
      assert(got.contains((1L, "10:04", Some(10.0))))
      assert(got.contains((1L, "10:09", None)))
    } finally q.stop()
  }

  test("stream-static as-of (enrichAsOf) equals the batch flagship") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // Seeded random entities over a STATIC feature table — the canonical
    // online-serving shape (entity stream × offline feature snapshot).
    // Feature timestamps are unique per key (minute = index) so the
    // latest-pick is tie-free and the comparison exact.
    val rnd = new scala.util.Random(11)
    val feats = Seq.tabulate(30)(i =>
      (rnd.nextInt(4).toLong, ts(i), i.toDouble))
    val ents = Seq.tabulate(20)(i =>
      KeyedEvent(rnd.nextInt(5).toLong, ts(rnd.nextInt(40)), 100.0 + i))
    val featsDf = feats.toDF("user_id", "fts", "fval")

    val in = MemoryStream[KeyedEvent]
    val q = StreamingOps.enrichAsOf(
      in.toDF(), featsDf, Seq("user_id"), "ts", "fts", Seq("fval"),
      ttlSeconds = 600, watermark = "1 hour")
      .writeStream.format("memory").queryName("ssa_vs_batch")
      .outputMode("append").start()
    try {
      // two out-of-order chunks, then a sentinel to flush the watermark
      in.addData(ents.drop(10): _*)
      q.processAllAvailable()
      in.addData(ents.take(10): _*)
      q.processAllAvailable()
      in.addData(KeyedEvent(99, ts(600), 0))
      q.processAllAvailable()

      val streamed = spark.table("ssa_vs_batch")
        .filter($"user_id" =!= 99L)
        .select("user_id", "ts", "value", "fval")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2),
          Option(r.get(3)).map(_.asInstanceOf[Double])))
        .sorted.toSeq

      featsDf.createOrReplaceTempView("ssa_feats")
      val fv = graft.model.FeatureView("f", Seq("user_id"),
        graft.sources.FeatureSource(table = Some("ssa_feats"),
          eventTimestampColumn = "fts"),
        features = Seq("fval"), ttlSeconds = 600)
      val batch = graft.PointInTime.getHistoricalFeatures(
        ents.toDF("user_id", "ts", "value")
          .withColumnRenamed("ts", "event_timestamp"),
        Seq(fv), entityTsCol = "event_timestamp")
        .collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("event_timestamp").getTime,
          r.getAs[Double]("value"),
          Option(r.getAs[Any]("fval")).map(_.asInstanceOf[Double])))
        .sorted.toSeq

      assert(streamed == batch,
        s"stream-static != batch\nstream: $streamed\nbatch:  $batch")
    } finally q.stop()
  }

  test("dedupStream drops exact duplicate ids within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = StreamingOps.dedupStream(in.toDF(), Seq("user_id"), "ts")
      .writeStream.format("memory").queryName("dedup_t")
      .outputMode("append").start()
    try {
      in.addData(
        KeyedEvent(1, ts(1), 1), KeyedEvent(1, ts(1), 1),
        KeyedEvent(1, ts(5), 2), // same id, LATER ts — still a duplicate id
        KeyedEvent(3, ts(2), 3))
      q.processAllAvailable()
      val n = spark.table("dedup_t").count()
      // per-ID dedup within the watermark: id 1 once, id 3 once
      assert(n == 2, s"expected 2 rows, got $n")
    } finally q.stop()
  }

  test("fingerprintDedupStream == batch min-per-fp dedup on in-order clips") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the planted near-dup audio fixtures: 4 members per family share a
    // fingerprint; batch dedup keeps min(doc_id) per fp
    val ids = (0L until 32L).toDF("doc_id")
    val clips = graft.llm.Multimodal
      .synthesizeNearDupAudio(ids, "doc_id")
      .select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect().sortBy(_._1)
    // group by (fp_hi, fp_lo) ONLY — the stream's exact dedup key; fp is
    // the family column, NOT part of the key, so it rides along via
    // min_by (the fp of the kept min-doc_id row). Grouping by fp too
    // would let a 64-bit collision across families keep two rows where
    // the stream keeps one, silently weakening the twin (ADVICE r11).
    val batchKeep = graft.llm.Multimodal.audioFingerprint(
      graft.llm.Multimodal.synthesizeNearDupAudio(ids, "doc_id"))
      .toDF().groupBy("fp_hi", "fp_lo")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("doc_id"),
        org.apache.spark.sql.functions.min_by(
          org.apache.spark.sql.functions.col("fp"),
          org.apache.spark.sql.functions.col("doc_id")).as("fp"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("fp")).toSet
    val in = MemoryStream[(Long, Timestamp, Array[Byte])]
    val q = StreamingOps.fingerprintDedupStream(
      in.toDF().toDF("doc_id", "ts", "payload"))
      .writeStream.format("memory").queryName("fpdedup_t")
      .outputMode("append").start()
    try {
      // two in-order micro-batches (split mid-family: doc 17's family
      // leader arrived in batch 1, so 17 must still be dropped)
      val (b1, b2) = clips.splitAt(17)
      in.addData(b1.map { case (id, p) => (id, ts(1), p) }.toSeq)
      q.processAllAvailable()
      in.addData(b2.map { case (id, p) => (id, ts(2), p) }.toSeq)
      q.processAllAvailable()
      val got = spark.table("fpdedup_t")
        .select("doc_id", "fp").as[(Long, Long)].collect().toSet
      assert(got == batchKeep,
        s"stream kept ${got.size}, batch kept ${batchKeep.size}; " +
          s"diff ${(got -- batchKeep) ++ (batchKeep -- got)}")
    } finally q.stop()
  }

  test("sessionCounts closes a session after the gap, splits on it") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[KeyedEvent]
    val q = StreamingOps.sessionCounts(
      in.toDF(), "ts", "user_id", gap = "5 minutes", watermark = "0 seconds")
      .writeStream.format("memory").queryName("sess_t")
      .outputMode("append").start()
    try {
      // two bursts 20 min apart -> two sessions for user 1
      in.addData(
        KeyedEvent(1, ts(0), 1), KeyedEvent(1, ts(3), 2),
        KeyedEvent(1, ts(23), 3),
        KeyedEvent(2, ts(1), 4))
      q.processAllAvailable()
      in.addData(KeyedEvent(9, ts(120), 0)) // advance the watermark
      q.processAllAvailable()
      val got = spark.table("sess_t")
        .selectExpr("user_id", "n_events").as[(Long, Long)]
        .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
      assert(got(1L) == Seq(1L, 2L), s"user 1 sessions: ${got(1L)}")
      assert(got(2L) == Seq(1L))
    } finally q.stop()
  }

  test("stream-stream as-of: late-arriving features still enrich") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val eIn = MemoryStream[KeyedEvent]
    val fIn = MemoryStream[KeyedEvent]
    val q = StreamingOps.enrichAsOfStreamStream(
      eIn.toDS(), fIn.toDS(), ttlSeconds = 0, watermark = "0 seconds")
      .writeStream.format("memory").queryName("ss_asof")
      .outputMode("append").start()
    try {
      // the entity arrives BEFORE its feature — stream-static can't do this
      eIn.addData(KeyedEvent(1, ts(5), 1.0))
      q.processAllAvailable()
      fIn.addData(KeyedEvent(1, ts(0), 10.0))
      q.processAllAvailable()
      // not yet finalized: the watermark hasn't passed ts(5)
      assert(spark.table("ss_asof").count() == 0)

      // second feature version + a later entity row
      fIn.addData(KeyedEvent(1, ts(10), 11.0))
      eIn.addData(KeyedEvent(1, ts(15), 2.0))
      eIn.addData(KeyedEvent(2, ts(15), 3.0)) // no features at all → None
      // advance BOTH watermarks past ts(15)
      eIn.addData(KeyedEvent(9, ts(60), 0.0))
      fIn.addData(KeyedEvent(9, ts(60), 0.0))
      q.processAllAvailable()

      val got = spark.table("ss_asof").as[StreamingOps.EnrichedEvent]
        .collect().map(r =>
          (r.user_id, r.ts.toString.substring(11, 16), r.value, r.feature))
        .toSet
      assert(got == Set(
        (1L, "10:05", 1.0, Some(10.0)), // ts(0) feature, arrived late
        (1L, "10:15", 2.0, Some(11.0)), // newer version wins
        (2L, "10:15", 3.0, None)))      // left semantics survive
    } finally q.stop()
  }

  test("stream-stream as-of honors the TTL lower bound") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val eIn = MemoryStream[KeyedEvent]
    val fIn = MemoryStream[KeyedEvent]
    val q = StreamingOps.enrichAsOfStreamStream(
      eIn.toDS(), fIn.toDS(), ttlSeconds = 300, watermark = "0 seconds")
      .writeStream.format("memory").queryName("ss_asof_ttl")
      .outputMode("append").start()
    try {
      fIn.addData(KeyedEvent(1, ts(0), 10.0))
      eIn.addData(
        KeyedEvent(1, ts(4), 1.0),  // within 5 min of the feature → hit
        KeyedEvent(1, ts(9), 2.0))  // 9 min after → expired → None
      eIn.addData(KeyedEvent(9, ts(60), 0.0))
      fIn.addData(KeyedEvent(9, ts(60), 0.0))
      q.processAllAvailable()
      val got = spark.table("ss_asof_ttl").as[StreamingOps.EnrichedEvent]
        .collect().map(r => (r.ts.toString.substring(11, 16), r.feature)).toSet
      assert(got == Set(("10:04", Some(10.0)), ("10:09", None)))
    } finally q.stop()
  }

  test("stream-stream as-of equals the batch flagship on the same data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // randomized-but-seeded data, interleaved arrival order
    val rnd = new scala.util.Random(7)
    val feats = Seq.tabulate(30)(i =>
      KeyedEvent(rnd.nextInt(4).toLong, ts(rnd.nextInt(40)), i.toDouble))
    val ents = Seq.tabulate(20)(i =>
      KeyedEvent(rnd.nextInt(5).toLong, ts(rnd.nextInt(40)), 100.0 + i))

    val eIn = MemoryStream[KeyedEvent]
    val fIn = MemoryStream[KeyedEvent]
    // 1-hour watermark delay: the interleaved chunks below are in-order
    // WITHIN the contract (nothing is late until the final sentinel
    // advances the watermark past everything) — arrival order across
    // the two streams is then provably irrelevant
    val q = StreamingOps.enrichAsOfStreamStream(
      eIn.toDS(), fIn.toDS(), ttlSeconds = 600, watermark = "1 hour")
      .writeStream.format("memory").queryName("ss_vs_batch")
      .outputMode("append").start()
    try {
      // features arrive in two chunks AFTER some entities — arrival
      // order must not matter
      eIn.addData(ents.take(10): _*)
      q.processAllAvailable()
      fIn.addData(feats.take(15): _*)
      eIn.addData(ents.drop(10): _*)
      q.processAllAvailable()
      fIn.addData(feats.drop(15): _*)
      q.processAllAvailable()
      eIn.addData(KeyedEvent(99, ts(600), 0)) // advance both watermarks
      fIn.addData(KeyedEvent(99, ts(600), 0))
      q.processAllAvailable()

      val streamed = spark.table("ss_vs_batch")
        .as[StreamingOps.EnrichedEvent].collect()
        .filter(_.user_id != 99L)
        .map(e => (e.user_id, e.ts.getTime, e.value, e.feature))
        .sorted.toSeq

      // batch flagship over identical rows. The stream-stream tie rule
      // (same feature ts → larger value) maps to tieBreakColumns=value.
      feats.toDF("user_id", "fts", "fval")
        .createOrReplaceTempView("ssb_feats")
      val fv = graft.model.FeatureView("f", Seq("user_id"),
        graft.sources.FeatureSource(table = Some("ssb_feats"),
          eventTimestampColumn = "fts"),
        features = Seq("fval"), ttlSeconds = 600,
        tieBreakColumns = Seq("fval"))
      val batch = graft.PointInTime.getHistoricalFeatures(
        ents.toDF("user_id", "ts", "value")
          .withColumnRenamed("ts", "event_timestamp"),
        Seq(fv), entityTsCol = "event_timestamp")
        .collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("event_timestamp").getTime,
          r.getAs[Double]("value"),
          Option(r.getAs[Any]("fval")).map(_.asInstanceOf[Double])))
        .sorted.toSeq

      assert(streamed == batch,
        s"stream-stream != batch\nstream: $streamed\nbatch:  $batch")
    } finally q.stop()
  }

  test("funnelStream walks stages in event-time order across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stages = Seq("view", "click", "buy")
    val in = MemoryStream[StreamingOps.TypedEvent]
    // 10-minute delay: the cross-batch out-of-order arrivals below stay
    // within the lateness contract until the sentinel closes them out
    val q = StreamingOps.funnelStream(in.toDS(), stages, watermark = "10 minutes")
      .writeStream.format("memory").queryName("funnel_t")
      .outputMode("append").start()
    try {
      // the CLICK arrives in an earlier micro-batch than the VIEW, but
      // event-time order is view(10:01) < click(10:03) — buffering must
      // wait for the watermark, then walk in ts order
      in.addData(StreamingOps.TypedEvent(1, ts(3), "click"))
      q.processAllAvailable()
      in.addData(StreamingOps.TypedEvent(1, ts(1), "view"))
      // key 2 clicks without ever viewing: no stage reached
      in.addData(StreamingOps.TypedEvent(2, ts(2), "click"))
      q.processAllAvailable()
      in.addData(StreamingOps.TypedEvent(9, ts(30), "zzz")) // advance wm
      q.processAllAvailable()
      val got = spark.table("funnel_t").as[StreamingOps.StageReach]
        .collect().map(r => (r.user_id, r.stage_idx, r.stage)).toSet
      assert(got == Set((1L, 1, "view"), (1L, 2, "click")))

      // the funnel RESUMES from persisted per-key progress: a later buy
      // completes stage 3 exactly once
      in.addData(StreamingOps.TypedEvent(1, ts(40), "buy"))
      q.processAllAvailable()
      in.addData(StreamingOps.TypedEvent(9, ts(90), "zzz"))
      q.processAllAvailable()
      val got2 = spark.table("funnel_t").as[StreamingOps.StageReach]
        .collect().map(r => (r.user_id, r.stage_idx)).toSet
      assert(got2 == Set((1L, 1), (1L, 2), (1L, 3)))
    } finally q.stop()
  }

  test("funnelStream equals the batch funnel on the same events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val stages = Seq("view", "click", "buy")
    val types = Array("view", "click", "buy", "other")
    val rnd = new scala.util.Random(11)
    val evs = Seq.tabulate(120)(_ => StreamingOps.TypedEvent(
      rnd.nextInt(12).toLong, ts(rnd.nextInt(50)), types(rnd.nextInt(4))))

    val in = MemoryStream[StreamingOps.TypedEvent]
    val q = StreamingOps.funnelStream(in.toDS(), stages, watermark = "1 hour")
      .writeStream.format("memory").queryName("funnel_eq")
      .outputMode("append").start()
    try {
      // three interleaved chunks — nothing is late within the 1h contract
      in.addData(evs.take(40): _*)
      q.processAllAvailable()
      in.addData(evs.slice(40, 80): _*)
      q.processAllAvailable()
      in.addData(evs.drop(80): _*)
      q.processAllAvailable()
      in.addData(StreamingOps.TypedEvent(99, ts(600), "zzz")) // advance wm
      q.processAllAvailable()

      val streamed = spark.table("funnel_eq").as[StreamingOps.StageReach]
        .collect().filter(_.user_id != 99L)
        .groupBy(r => (r.stage_idx, r.stage))
        .map { case (k, v) => (k._1, k._2, v.length.toLong) }.toSet

      val batch = graft.Funnel.funnel(
        evs.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "event_type", stages)
        .as[(Int, String, Long)].collect().toSet
      assert(streamed == batch,
        s"stream != batch\nstream: $streamed\nbatch: $batch")
    } finally q.stop()
  }

  test("retentionStream equals batch retention on the same events") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val day = 86400000L
    def tsd(d: Int): Timestamp = // day d of 2024, mid-day
      new Timestamp(Timestamp.valueOf("2024-01-01 12:00:00").getTime + d * day)
    val rnd = new scala.util.Random(13)
    val evs = Seq.tabulate(150)(_ => StreamingOps.KeyedEvent(
      rnd.nextInt(10).toLong, tsd(rnd.nextInt(42)), 1.0))

    val in = MemoryStream[StreamingOps.KeyedEvent]
    // the chunks interleave events across the full 42-day span — a
    // 50-day delay keeps every arrival inside the lateness contract, so
    // arrival order is provably irrelevant (as in the as-of equality test)
    val q = StreamingOps.retentionStream(in.toDS(), watermark = "50 days")
      .writeStream.format("memory").queryName("ret_eq")
      .outputMode("append").start()
    try {
      in.addData(evs.take(50): _*)
      q.processAllAvailable()
      in.addData(evs.slice(50, 100): _*)
      q.processAllAvailable()
      in.addData(evs.drop(100): _*)
      q.processAllAvailable()
      in.addData(StreamingOps.KeyedEvent(99, tsd(150), 0.0)) // wm → day 100
      q.processAllAvailable()

      val streamed = spark.table("ret_eq").as[StreamingOps.CohortHit]
        .collect().filter(_.user_id != 99L)
        .groupBy(r => (r.cohort_week, r.week_offset))
        .map { case (k, v) => (k._1, k._2, v.length.toLong) }.toSet

      val batch = graft.Funnel.retention(
        evs.toDF("user_id", "ts", "value"), "user_id", "ts")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"stream != batch\nstream: $streamed\nbatch: $batch")
    } finally q.stop()
  }

  test("retentionStream emits each (key, week) exactly once across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val wk0 = Timestamp.valueOf("2024-01-04 00:00:00") // mid-week anchor
    def tw(w: Int): Timestamp =
      new Timestamp(wk0.getTime + w * 604800000L)
    val in = MemoryStream[StreamingOps.KeyedEvent]
    val q = StreamingOps.retentionStream(in.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("ret_once")
      .outputMode("append").start()
    try {
      in.addData(StreamingOps.KeyedEvent(1, tw(0), 1.0))
      q.processAllAvailable()
      // the same week again (duplicate), plus two later weeks
      in.addData(
        StreamingOps.KeyedEvent(1, tw(0), 2.0),
        StreamingOps.KeyedEvent(1, tw(2), 3.0),
        StreamingOps.KeyedEvent(1, tw(3), 4.0))
      q.processAllAvailable()
      in.addData(StreamingOps.KeyedEvent(99, tw(9), 0.0))
      q.processAllAvailable()
      val got = spark.table("ret_once").as[StreamingOps.CohortHit]
        .collect().filter(_.user_id == 1L)
        .map(r => r.week_offset).sorted.toSeq
      assert(got == Seq(0L, 2L, 3L), s"offsets: $got")
    } finally q.stop()
  }

  test("gapsStream equals the batch lag-window gap stats on the same events") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(17)
    val evs = Seq.tabulate(200)(i => StreamingOps.GapEvent(
      rnd.nextInt(8).toLong, ts(rnd.nextInt(55)), i.toLong))

    val in = MemoryStream[StreamingOps.GapEvent]
    val q = StreamingOps.gapsStream(in.toDS(), watermark = "1 hour")
      .writeStream.format("memory").queryName("gaps_eq")
      .outputMode("append").start()
    try {
      in.addData(evs.take(70): _*)
      q.processAllAvailable()
      in.addData(evs.slice(70, 140): _*)
      q.processAllAvailable()
      in.addData(evs.drop(140): _*)
      q.processAllAvailable()
      in.addData(StreamingOps.GapEvent(99, ts(600), 9999)) // advance wm
      q.processAllAvailable()

      // LATEST snapshot per key (largest n_events) == the batch aggregate
      val streamed = spark.table("gaps_eq").as[StreamingOps.GapStats]
        .collect().filter(_.user_id != 99L)
        .groupBy(_.user_id).map { case (k, v) =>
          val last = v.maxBy(_.n_events)
          (k, last.n_events, last.sum_gap_us, last.max_gap_us)
        }.toSet

      val w = Window.partitionBy("user_id")
        .orderBy(org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("event_id"))
      val batch = evs.toDF("user_id", "ts", "event_id")
        .withColumn("gap_us",
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum("gap_us").as("sum_gap_us"),
          max("gap_us").as("max_gap_us"))
        .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      assert(streamed == batch,
        s"stream != batch\nstream: $streamed\nbatch: $batch")
    } finally q.stop()
  }

  test("gapsStream emits running snapshots as micro-batches finalize") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[StreamingOps.GapEvent]
    val q = StreamingOps.gapsStream(in.toDS(), watermark = "0 seconds")
      .writeStream.format("memory").queryName("gaps_inc")
      .outputMode("append").start()
    try {
      in.addData(StreamingOps.GapEvent(1, ts(0), 1))
      q.processAllAvailable()
      in.addData(StreamingOps.GapEvent(1, ts(5), 2)) // finalizes ts(0)
      q.processAllAvailable()
      in.addData(StreamingOps.GapEvent(1, ts(7), 3)) // finalizes ts(5)
      q.processAllAvailable()
      in.addData(StreamingOps.GapEvent(99, ts(60), 9)) // finalizes ts(7)
      q.processAllAvailable()
      val snaps = spark.table("gaps_inc").as[StreamingOps.GapStats]
        .collect().filter(_.user_id == 1L)
        .sortBy(_.n_events)
        .map(s => (s.n_events, s.sum_gap_us, s.max_gap_us)).toSeq
      // snapshots: after 1 event (NULL gaps), after 2 (300s), after 3
      // (300+120s, max 300s) — all microseconds
      assert(snaps == Seq(
        (1L, None, None),
        (2L, Some(300000000L), Some(300000000L)),
        (3L, Some(420000000L), Some(300000000L))), s"snaps: $snaps")
    } finally q.stop()
  }

  test("stream-fed online store equals one batch write over the same rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val rnd = new scala.util.Random(23)
    // several versions per key, delivered SHUFFLED across micro-batches
    val evs = rnd.shuffle(Seq.tabulate(60)(i => KeyedEvent(
      (i % 9).toLong, ts(rnd.nextInt(50)), i.toDouble)))

    val streamStore = new graft.OnlineStore(Seq("user_id"), "ts", None)
    val in = MemoryStream[KeyedEvent]
    val q = StreamingOps.materializeInto(in.toDF(), streamStore)
    try {
      in.addData(evs.take(20): _*)
      q.processAllAvailable()
      in.addData(evs.slice(20, 40): _*)
      q.processAllAvailable()
      // REPLAY batch 2 (at-least-once delivery): latest-wins idempotence
      // means the state cannot change
      streamStore.write(evs.slice(20, 40).toDF("user_id", "ts", "value"))
      in.addData(evs.drop(40): _*)
      q.processAllAvailable()
    } finally q.stop()

    val batchStore = new graft.OnlineStore(Seq("user_id"), "ts", None)
    batchStore.write(evs.toDF("user_id", "ts", "value"))

    def rows(s: graft.OnlineStore) = s.snapshot.get
      .as[KeyedEvent].collect().map(e => (e.user_id, e.ts, e.value)).toSet
    assert(rows(streamStore) == rows(batchStore),
      s"stream-fed != batch-fed:\n${rows(streamStore)}\n${rows(batchStore)}")
    // point reads agree too
    (0L until 9L).foreach { k =>
      assert(streamStore.get(Map("user_id" -> k)) ==
        batchStore.get(Map("user_id" -> k)), s"key $k diverged")
    }
  }

  test("enrichAsOf rejects columns colliding with internal __f_* names") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val features = Seq((1L, ts(0), 10.0)).toDF("user_id", "fts", "conv")
    val in = MemoryStream[KeyedEvent]
    val entityWithReserved =
      in.toDF().withColumn("__f_ts", org.apache.spark.sql.functions.col("ts"))
    val e = intercept[IllegalArgumentException] {
      StreamingOps.enrichAsOf(
        entityWithReserved, features, Seq("user_id"), "ts", "fts",
        Seq("conv"), ttlSeconds = 0, watermark = "0 seconds")
    }
    assert(e.getMessage.contains("__f_ts"))
  }
}
