package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.FeatureSource

/** Proof that a date-partitioned source layout actually prunes at the scan
  * when read through FeatureSource (ref: hive_source.py:82-119 carries
  * `date_partition_column`; Spark prunes from predicates on its own).
  * This is the documented mitigation for the Tables.scala NANOS caveat —
  * repaired timestamp columns can't reach PushedFilters, but a partition
  * column does better: whole directories are never listed into the scan. */
class PartitionPruningSpec extends SparkSpec {

  test("dt predicate becomes a partition filter and prunes files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    (0 until 1000).map(i => (i.toLong, i % 10, f"2024-01-0${1 + i % 5}"))
      .toDF("id", "v", "dt")
      .write.mode("overwrite").partitionBy("dt").parquet(dir)

    val src = FeatureSource(
      path = Some(dir), eventTimestampColumn = "ts",
      datePartitionColumn = Some("dt"))

    val pruned = src.resolve(spark).filter(col("dt") === "2024-01-03")
    // execute THIS plan instance so its scan metrics populate
    val got = pruned.queryExecution.executedPlan.executeCollect()
    assert(got.length == 200)

    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec leaf"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "dt")),
      s"dt predicate must be a PartitionFilter, got: ${scan.partitionFilters}")

    val filesInTarget = new java.io.File(s"$dir/dt=2024-01-03")
      .listFiles().count(_.getName.endsWith(".parquet"))
    val filesTotal = (1 to 5).map(d => new java.io.File(s"$dir/dt=2024-01-0$d")
      .listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(scan.metrics("numFiles").value == filesInTarget,
      "scan must read only the matching partition's files")
    assert(filesInTarget < filesTotal, "fixture must have >1 partition")
  }

  test("BETWEEN on a plain microsecond timestamp reaches PushedFilters") {
    // the P6 range predicate on a NON-repaired timestamp column must push
    // into the parquet scan (the repaired-NANOS `events.ts` cannot — the
    // partitioned layout above is its mitigation)
    val df = Tables.read(spark, sf(), "lineitem")
      .filter(col("l_shipdate").between(
        lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")),
        lit(java.sql.Timestamp.valueOf("1996-06-01 00:00:00"))))
      .select("l_orderkey", "l_shipdate")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec leaf"))
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate") &&
      pushed.contains("LessThanOrEqual(l_shipdate"),
      s"BETWEEN must push both bounds, got: $pushed")
    // and projection pruning: only the two selected columns are read
    val readSchema = scan.metadata.getOrElse("ReadSchema", "")
    assert(readSchema.contains("l_orderkey") &&
      readSchema.contains("l_shipdate") &&
      !readSchema.contains("l_extendedprice"),
      s"scan must read only selected columns, got: $readSchema")
  }

  test("pruning works on a partitioned events layout via FeatureSource") {
    // A date-partitioned rewrite of events (the layout Tables.scala's scale
    // note prescribes for NANOS sources — note the rewrite itself lands as
    // µs, Spark can't write NANOS). Proves the FeatureSource path prunes on
    // dt, and exercises readParquet's recursive footer probe over the
    // dt=…/part-*.parquet directory structure.
    val dir = java.nio.file.Files.createTempDirectory("graft_part_ev").toString
    Tables.read(spark, sf(), "events")
      .withColumn("dt", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("dt").parquet(dir)

    val src = FeatureSource(
      path = Some(dir), eventTimestampColumn = "ts",
      datePartitionColumn = Some("dt"))
    val days = src.resolve(spark).select("dt").distinct().count()
    assert(days > 1, "fixture spans several days")

    val oneDay = src.resolve(spark).filter(col("dt") === "2024-01-10")
    val got = oneDay.queryExecution.executedPlan.executeCollect()
    assert(got.nonEmpty)
    val scan = oneDay.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("expected a FileSourceScanExec leaf"))
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "dt")))
    val filesInTarget = new java.io.File(s"$dir/dt=2024-01-10")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(scan.metrics("numFiles").value == filesInTarget)
  }
}
