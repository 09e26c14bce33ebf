package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Dedup

/** Streaming ingestion against a static corpus: per-document decisions
  * can't depend on micro-batch boundaries, so the streamed filter must
  * equal the batch operator on the union of batches. */
class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  test("stream-static exact-ingest filter equals the batch anti-join") {
    implicit val ctx = spark.sqlContext
    val corpus = Seq(
      (1L, "known document one about spark shuffles"),
      (2L, "known document two about parquet footers"))
      .toDF("doc_id", "text")
    val arriving = Seq(
      (101L, "known document one about spark shuffles"), // exact dup
      (102L, "Known  DOCUMENT two about parquet footers"), // dup after norm
      (103L, "a new document about bloom filters"),
      (104L, "another new document about z orders"))

    val in = MemoryStream[(Long, String)]
    val q = StreamingOps.ingestExactFilterStream(
      in.toDF().toDF("doc_id", "text"), corpus, "text", "text")
      .writeStream.format("memory").queryName("ingest_t")
      .outputMode("append").start()
    try {
      // two micro-batches split mid-list
      in.addData(arriving.take(2)); q.processAllAvailable()
      in.addData(arriving.drop(2)); q.processAllAvailable()
      val streamed = spark.table("ingest_t")
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == Set(103L, 104L),
        "normalized exact dups must be dropped, novel docs kept")

      // equals the batch operator's exact half on the same input
      val batch = Dedup.dropDuplicatesAgainst(
        arriving.toDF("doc_id", "text"), corpus, "doc_id", "text",
        n = 3, tau = 0.99) // tau ~1: near-dup stage inert, exact only
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }
}
