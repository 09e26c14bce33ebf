package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.llm.Web

/** Streaming recrawl merge vs batch [[Web.crawlMerge]]: the SAME
  * declarative plan run incrementally must converge to the batch answer
  * under any batching/ordering of exactly-once delivery — and its
  * replay contract is FIELD-SPLIT: the max(struct) pick is idempotent
  * under at-least-once re-delivery, while n_fetches (a count) diverges
  * by exactly the re-emitted rows. Both directions proved. */
class WebStreamSpec extends SparkSpec {

  private def fetchRows: Seq[(String, Long, String)] =
    (0 until 400).flatMap { i =>
      val url = s"https://site${i % 37}.example/p/$i"
      Seq(
        (url, 1000L + i, s"old-$i"),
        (url, 2000L + i, s"new-$i")) ++
        (if (i % 5 == 0) Seq((url, 3000L + i, s"final-$i")) else Nil)
    }

  test("streaming merge equals batch merge under shuffled exactly-once " +
    "micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val rows = scala.util.Random.javaRandomToRandom(
      new java.util.Random(13)).shuffle(fetchRows)
    val in = MemoryStream[(String, Long, String)]
    val q = StreamingOps.crawlMergeStream(
      in.toDF().toDF("url", "fetch_ts", "text"))
      .writeStream.format("memory").queryName("crawl_merge_t")
      .outputMode("complete").start()
    try {
      val (b1, rest) = rows.splitAt(300)
      val (b2, b3) = rest.splitAt(300)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      in.addData(b3); q.processAllAvailable()

      val stream = spark.table("crawl_merge_t")
        .as[(String, Long, String, Long)].collect().toSet
      val batch = Web.crawlMerge(
        fetchRows.toDF("url", "fetch_ts", "text"), "url", "fetch_ts", "text")
        .as[(String, Long, String, Long)].collect().toSet
      assert(stream == batch)
      assert(stream.size == 400) // one state row per URL
    } finally q.stop()
  }

  test("at-least-once replay: the latest-fetch pick is idempotent, " +
    "n_fetches diverges by exactly the re-emitted rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    val rows = fetchRows
    val replayed = rows.take(100)
    val in = MemoryStream[(String, Long, String)]
    val q = StreamingOps.crawlMergeStream(
      in.toDF().toDF("url", "fetch_ts", "text"))
      .writeStream.format("memory").queryName("crawl_replay_t")
      .outputMode("complete").start()
    try {
      in.addData(rows); q.processAllAvailable()
      in.addData(replayed); q.processAllAvailable() // source re-emits
      val stream = spark.table("crawl_replay_t")
        .as[(String, Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val batch = Web.crawlMerge(
        rows.toDF("url", "fetch_ts", "text"), "url", "fetch_ts", "text")
        .as[(String, Long, String, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val replayCounts = replayed.groupBy(_._1).view.mapValues(_.size)
      assert(stream.keySet == batch.keySet)
      stream.foreach { case (url, (ts, text, n)) =>
        val (bts, btext, bn) = batch(url)
        assert(ts == bts && text == btext,
          s"$url: picked fetch must be replay-idempotent")
        assert(n == bn + replayCounts.getOrElse(url, 0).toLong,
          s"$url: count must diverge by exactly the re-emitted rows")
      }
    } finally q.stop()
  }
}
