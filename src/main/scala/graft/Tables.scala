package graft

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loader used both for the driver testdata (`/root/testdata/sf*`,
  * see TESTDATA.md) and for arbitrary user parquet paths via
  * [[graft.sources.FeatureSource]].
  *
  * One quirk: some files (e.g. `events.parquet`) store timestamps as parquet
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright. We
  * detect NANOS columns from the parquet footer (schema-driven — no
  * file-name heuristics), read them as longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and convert to microsecond
  * `TimestampType` with integer division — the same truncation DuckDB
  * applies when casting TIMESTAMP_NS → TIMESTAMP, so oracle comparisons
  * agree to the microsecond.
  *
  * Scale note: because the repaired column is DERIVED, timestamp
  * predicates on it cannot reach the parquet scan's PushedFilters (plain
  * µs/ms timestamp columns push down fine — verified on lineitem). For
  * 100 TB NANOS sources, partition the files by a date column and filter
  * on that (partition pruning still applies); better, write µs parquet.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    readParquet(spark, s"$dir/$name.parquet")

  /** Read a parquet file/directory, transparently repairing any
    * TIMESTAMP(NANOS) columns into microsecond timestamps. */
  def readParquet(spark: SparkSession, path: String): DataFrame = {
    val nanosCols = nanosTimestampColumns(spark, path)
    if (nanosCols.isEmpty) spark.read.parquet(path)
    else {
      // Only needed (and only set) when the footer actually has NANOS cols.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(path)
      nanosCols.foldLeft(df) { (d, c) =>
        // `div` (integer division) is essential: epoch-nanos ≈ 1.7e18
        // exceeds the 2^53 exact-double range, so `/` would corrupt low bits.
        d.withColumn(c, timestamp_micros(expr(s"`$c` div 1000")))
      }
    }
  }

  /** Top-level column names declared TIMESTAMP(NANOS) in the parquet footer
    * of `path` (a single file or a directory of part files). */
  private def nanosTimestampColumns(
      spark: SparkSession, path: String): Seq[String] = {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) return Nil
    // Recursive: partitioned layouts keep part files in subdirectories
    // (dir/date=…/part-*.parquet) — one footer anywhere suffices.
    def firstParquet(dir: Path, depth: Int): Option[Path] = {
      if (depth > 10) return None
      val entries = fs.listStatus(dir).filterNot(_.getPath.getName.startsWith("_"))
      entries.find(e => !e.isDirectory && e.getPath.getName.endsWith(".parquet"))
        .map(_.getPath)
        .orElse(entries.filter(_.isDirectory).sortBy(_.getPath.getName)
          .iterator.flatMap(d => firstParquet(d.getPath, depth + 1))
          .nextOption())
    }
    val file =
      if (fs.getFileStatus(p).isDirectory) firstParquet(p, 0)
      else Some(p)
    file.toSeq.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, hconf))
      try {
        reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
          case fld if fld.isPrimitive && (fld.getLogicalTypeAnnotation match {
            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
              t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
            case _ => false
          }) => fld.getName
        }.toSeq
      } finally reader.close()
    }
  }
}
