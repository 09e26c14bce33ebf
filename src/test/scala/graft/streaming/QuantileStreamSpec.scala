package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Sketches

/** Streaming quantile-sketch registers == the batch sample, under
  * out-of-order AND at-least-once (replayed) delivery: the sample is
  * distinct on (row hash, value), so a re-delivered row re-inserts as a
  * no-op — the KMV replay argument, proved here for the quantile
  * registers and therefore for every finished quantile. */
class QuantileStreamSpec extends SparkSpec {

  test("streaming sample equals the batch sketch under replayed delivery") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // (rowId, value): values from a skewed deterministic shape
    val rows = (1 to 5000).map(i => (i.toLong, (i * i % 997).toDouble))

    val in = MemoryStream[(Long, Double)]
    val q = StreamingOps.quantileSampleStream(
      in.toDF().toDF("id", "v"), "v", col("id"), k = 512)
      .writeStream.format("memory").queryName("qsk_regs_t")
      .outputMode("complete").start()
    try {
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(5)).shuffle(rows)
      val (b1, b2) = shuffled.splitAt(2500)
      in.addData(b1); q.processAllAvailable()
      in.addData(b2 ++ b1.take(400)); q.processAllAvailable() // replay
      val stream = spark.table("qsk_regs_t")
        .select(explode(col("sample")).as("s"))
        .select(col("s.h"), col("s.v")).as[(Long, Double)]
        .collect().toSeq.sorted

      val batchDf = rows.toDF("id", "v")
      val samp = udaf(new graft.functions.BottomKByHashAgg(512))
      val batch = batchDf.select(
          graft.llm.TextOps.hash32(col("id").cast("string")).as("h"),
          col("v"))
        .agg(samp(col("h"), col("v")).as("sample"))
        .select(explode(col("sample")).as("s"))
        .select(col("s.h"), col("s.v")).as[(Long, Double)]
        .collect().toSeq.sorted
      assert(stream == batch)
      assert(stream.length == 512)

      // identical registers ⇒ identical finished quantiles; and the
      // finished quantiles satisfy the DKW bound vs the full data
      val sv = stream.map(_._2).sorted
      val full = rows.map(_._2).sorted
      for (qq <- Seq(0.25, 0.5, 0.9)) {
        val est = sv(math.ceil(qq * sv.length).toInt - 1)
        val rank = full.count(_ <= est).toDouble / full.length
        assert(math.abs(rank - qq) <= 3 * math.sqrt(1.0 / (2 * 512)),
          s"q=$qq est $est rank $rank")
      }
    } finally q.stop()
  }

  test("batch sketch itself is idempotent under duplicated input rows") {
    import spark.implicits._
    val base = (1 to 3000).map(i => (i, (i * 7 % 211).toDouble)).toDF("id", "v")
    val withDups = base.union(base.limit(500)) // the same ROWS again
    def sketch(df: org.apache.spark.sql.DataFrame) =
      Sketches.quantileSketchBy(df, Nil, "v", col("id").cast("string"),
        Seq(0.25, 0.5, 0.75, 0.9), k = 256)
        .select("q", "est_value", "sample_n")
        .collect().map(_.toString).sorted.toSeq
    // n_rows differs (it counts deliveries) but sample and quantiles
    // cannot: a replayed row's (h, v) pair is already present
    assert(sketch(base) == sketch(withDups))
  }
}
