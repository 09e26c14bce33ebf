package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loader for the driver testdata (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * One quirk: `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS),
  * which Spark's parquet reader rejects outright. We read nanos as a long
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to a microsecond
  * `TimestampType` with integer division — the same truncation DuckDB
  * applies when casting TIMESTAMP_NS → TIMESTAMP, so oracle comparisons
  * agree to the microsecond.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Convert any nanos-as-long `ts` column back into a proper timestamp.
    // `div` (integer division) is essential: epoch-nanos ≈ 1.7e18 exceeds
    // the 2^53 exact-double range, so a `/` would corrupt low bits.
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) if name == "events" =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }
}
