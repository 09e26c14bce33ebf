package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Sketches

/** Streaming HLL == batch HLL: the register table is a monotone max, so
  * out-of-order, re-batched delivery must converge to the identical
  * sketch — and therefore the identical estimate. */
class HllStreamSpec extends SparkSpec {

  test("streaming registers equal the batch sketch under out-of-order delivery") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val keys = (1 to 3000).map(i => s"user-${i % 997}")

    val in = MemoryStream[String]
    val q = StreamingOps.hllRegistersStream(in.toDF(), "value")
      .writeStream.format("memory").queryName("hll_regs_t")
      .outputMode("complete").start()
    try {
      // three micro-batches, shuffled differently than arrival order,
      // with batch 3 REPLAYING some of batch 1 (at-least-once delivery)
      val (b1, rest) = scala.util.Random.javaRandomToRandom(
        new java.util.Random(42)).shuffle(keys).splitAt(1000)
      val (b2, b3) = rest.splitAt(1000)
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
      in.addData(b3 ++ b1.take(200))
      q.processAllAvailable()

      val streamRegs = spark.table("hll_regs_t")
        .select("bucket", "m").as[(Long, Int)].collect().toMap
      val batchRegs = Sketches
        .hllRegisters(keys.toDF("value"), "value")
        .select("bucket", "m").as[(Long, Int)].collect().toMap
      assert(streamRegs == batchRegs)

      // identical registers ⇒ identical finished estimate
      val streamEst = Sketches.hllEstimate(spark.table("hll_regs_t"))
        .select("est_hll", "denom").head()
      val batchEst = Sketches
        .hllEstimate(Sketches.hllRegisters(keys.toDF("value"), "value"))
        .select("est_hll", "denom").head()
      assert(streamEst == batchEst)
      // and the estimate is a sane distinct count for 997 true uniques
      val est = streamEst.getAs[Double]("est_hll")
      assert(math.abs(est - 997.0) <= 3 * 1.04 / math.sqrt(Sketches.HllM) * 997,
        s"est $est")
    } finally q.stop()
  }

  test("windowed streaming registers equal the per-window batch sketch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-03-01 $h%02d:$m%02d:00")
    // 3 hours of events, delivered out of order across micro-batches
    val all = for (h <- 10 to 12; m <- 0 until 60; u <- 1 to (h - 9))
      yield (s"u${(u * m) % 37}", ts(h, m))

    val in = MemoryStream[(String, java.sql.Timestamp)]
    val q = StreamingOps.hllWindowedStream(
      in.toDF().toDF("user", "ts"), "ts", "user", "1 hour", "3 hours")
      .writeStream.format("memory").queryName("hll_win_t")
      .outputMode("complete").start()
    try {
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).shuffle(all)
      val (b1, b2) = shuffled.splitAt(all.size / 2)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2); q.processAllAvailable()

      val stream = spark.table("hll_win_t")
        .select(col("window.start").as("ws"), col("bucket"), col("m"))
        .as[(java.sql.Timestamp, Long, Int)].collect().toSet
      val batch = Sketches.hllRegistersBy(
        all.toDF("user", "ts")
          .select(date_trunc("HOUR", col("ts")).as("ws"), col("user")),
        "user", Seq("ws"))
        .as[(java.sql.Timestamp, Long, Int)].collect().toSet
      assert(stream == batch)
      // per-window estimates agree too, and state is bounded
      val est = Sketches.hllEstimateBy(
        spark.table("hll_win_t")
          .select(col("window.start").as("ws"), col("bucket"), col("m")),
        Seq("ws")).collect()
      assert(est.length == 3)
      assert(stream.size <= 3 * Sketches.HllM)
    } finally q.stop()
  }

  test("register state is bounded by m regardless of input cardinality") {
    import spark.implicits._
    val regs = Sketches.hllRegisters(
      (1 to 50000).map(_.toString).toDF("value"), "value")
    assert(regs.count() <= Sketches.HllM)
    // every register is a legal rank
    val bad = regs.filter(col("m") < 1 || col("m") > Sketches.HllRankBits + 1)
    assert(bad.count() == 0)
  }
}
