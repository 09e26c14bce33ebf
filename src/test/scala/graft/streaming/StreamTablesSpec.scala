package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** [[Tables.readStreamParquet]] must see exactly what the batch reader
  * sees — same schema (including the NANOS→µs timestamp repair) and
  * same rows — because every streaming twin's stream==batch proof
  * silently assumes the two scans agree. Driven against the driver
  * testdata's single-file NANOS table (`events.parquet`), the layout
  * that needs the brace-glob/basePath workaround. */
class StreamTablesSpec extends SparkSpec {

  test("readStreamParquet == batch read on a single-file NANOS table") {
    implicit val ctx = spark.sqlContext
    val dir = sf()
    val batch = Tables.read(spark, dir, "events")
    val stream = Tables.readStreamParquet(spark, s"$dir/events.parquet",
      maxFilesPerTrigger = 1)
    assert(stream.isStreaming, "readStreamParquet must build a stream")
    assert(stream.schema == batch.schema,
      s"stream schema ${stream.schema.treeString} != batch " +
        batch.schema.treeString)
    val q = stream
      .select(col("event_id"), col("ts"), col("user_id"))
      .writeStream.format("memory").queryName("stream_tables_t")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_tables_t")
    val want = batch.select(col("event_id"), col("ts"), col("user_id"))
    assert(got.count() == want.count(), "row counts diverge")
    // the NANOS repair must land on identical microsecond instants:
    // an except in both directions is empty iff the scans agree row-wise
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream and batch scans must produce identical rows")
    spark.catalog.dropTempView("stream_tables_t")
  }

  test("readStreamParquet reads a directory-layout table unchanged") {
    implicit val ctx = spark.sqlContext
    // Spark-written (directory) parquet — the probe-corpus layout; no
    // basePath workaround should be needed and none should interfere
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_dir")
      .toString
    val path = s"$dir/docs.parquet"
    Tables.read(spark, sf(), "documents").limit(50)
      .write.mode("overwrite").parquet(path)
    val stream = Tables.readStreamParquet(spark, path, maxFilesPerTrigger = 2)
    val q = stream.select("doc_id")
      .writeStream.format("memory").queryName("stream_tables_dir_t")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("stream_tables_dir_t").count() == 50)
    spark.catalog.dropTempView("stream_tables_dir_t")
  }
}
