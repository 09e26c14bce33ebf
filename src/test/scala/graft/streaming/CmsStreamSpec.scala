package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Sketches

/** Streaming CMS vs batch CMS under the sketch's DELIVERY CONTRACT:
  * counters are sums, not maxes — so equality holds under any batching
  * and ordering of distinct records (Structured Streaming state applies
  * each record exactly once), while data-level replay (a source
  * re-emitting rows as new records) must diverge by EXACTLY the
  * re-emitted increments. Both directions are proved: the HLL-style
  * "replay is a no-op" property would be the WRONG assertion here. */
class CmsStreamSpec extends SparkSpec {

  test("streaming registers equal the batch sketch under out-of-order, " +
    "exactly-once delivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val keys = (1 to 4000).map(i => s"k-${i % 137}")

    val in = MemoryStream[String]
    val q = StreamingOps.cmsRegistersStream(in.toDF(), "value")
      .writeStream.format("memory").queryName("cms_regs_t")
      .outputMode("complete").start()
    try {
      // three micro-batches, shuffled — every record delivered ONCE
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(11)).shuffle(keys)
      val (b1, rest) = shuffled.splitAt(1500)
      val (b2, b3) = rest.splitAt(1500)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()
      in.addData(b3); q.processAllAvailable()

      val stream = spark.table("cms_regs_t")
        .select("r", "bucket", "c").as[(Int, Long, Long)].collect().toSet
      val batch = Sketches.cmsRegisters(keys.toDF("value"), "value")
        .select("r", "bucket", "c").as[(Int, Long, Long)].collect().toSet
      assert(stream == batch)
      // bounded state at any cardinality
      assert(stream.size <= Sketches.CmsDepth * Sketches.CmsWidth)
    } finally q.stop()
  }

  test("data-level replay diverges by exactly the re-emitted increments") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val keys = (1 to 2000).map(i => s"k-${i % 97}")
    val replayed = keys.take(300) // rows the source re-emits

    val in = MemoryStream[String]
    val q = StreamingOps.cmsRegistersStream(in.toDF(), "value")
      .writeStream.format("memory").queryName("cms_replay_t")
      .outputMode("complete").start()
    try {
      in.addData(keys); q.processAllAvailable()
      in.addData(replayed); q.processAllAvailable() // at-least-once source

      val stream = spark.table("cms_replay_t")
        .select("r", "bucket", "c").as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => (r, b) -> c }.toMap
      val clean = Sketches.cmsRegisters(keys.toDF("value"), "value")
        .select("r", "bucket", "c").as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => (r, b) -> c }.toMap
      val extra = Sketches.cmsRegisters(replayed.toDF("value"), "value")
        .select("r", "bucket", "c").as[(Int, Long, Long)].collect()
        .map { case (r, b, c) => (r, b) -> c }.toMap
      // never-undercount survives replay, and the damage is exactly the
      // replayed rows' own register increments — the documented bound
      assert(stream.keySet == (clean.keySet ++ extra.keySet))
      stream.foreach { case (rb, c) =>
        assert(c == clean.getOrElse(rb, 0L) + extra.getOrElse(rb, 0L),
          s"register $rb: stream $c != clean + replayed")
      }
    } finally q.stop()
  }
}
