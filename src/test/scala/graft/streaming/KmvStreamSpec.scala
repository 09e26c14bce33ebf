package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.llm.{Sketches, TextOps}

/** Streaming KMV registers == batch: bottom-k-distinct ignores ordering
  * and repetition, so out-of-order, replayed delivery converges to the
  * identical register sets. */
class KmvStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streamed bottom-k registers equal batch under replayed delivery") {
    implicit val ctx = spark.sqlContext
    val events = (1 to 2000).map(i =>
      (if (i % 2 == 0) "click" else "view", s"user-${i % 613}"))

    val in = MemoryStream[(String, String)]
    val q = StreamingOps.kmvRegistersStream(
      in.toDF().toDF("lab", "key"), "key", "lab", k = 64)
      .writeStream.format("memory").queryName("kmv_regs_t")
      .outputMode("complete").start()
    try {
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(3)).shuffle(events)
      val (b1, b2) = shuffled.splitAt(900)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2 ++ b1.take(300)); q.processAllAvailable() // replay

      val streamed = spark.table("kmv_regs_t")
        .as[(String, Seq[Long])].collect().toMap
      val batch = Sketches.kmvRegisters(
        events.toDF("lab", "key"), "key", "lab", k = 64)
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed == batch)

      // and both equal the brute-force bottom-k of distinct hashes
      val brute = events.toDF("lab", "key")
        .select($"lab", TextOps.hash32($"key").as("h"))
        .distinct().as[(String, Long)].collect()
        .groupBy(_._1).map { case (l, a) =>
          l -> a.map(_._2).distinct.sorted.take(64).toSeq
        }
      assert(batch == brute)
    } finally q.stop()
  }
}
