package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import StreamingOps.KeyedEvent

/** Streaming semantics driven through MemoryStream micro-batches. */
class StreamingSpec extends SparkSpec {

  private def ts(m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

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
}
