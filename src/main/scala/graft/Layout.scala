package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-layout control: Z-order (Morton) clustering.
  *
  * At 100 TB the scan is the query cost, and the only lever on an
  * immutable parquet lake is LAYOUT: writing files so that per-file
  * min/max footer ranges are narrow on the columns queries filter by.
  * Linear sort handles one column; Z-ordering interleaves the bits of
  * several, so a range predicate on ANY of the dimensions prunes files
  * (the Delta/Iceberg OPTIMIZE ZORDER trade, re-expressed as plain
  * `repartitionByRange` + `sortWithinPartitions` on a Morton key).
  *
  * The Morton code is pure integer bit arithmetic (the classic
  * spread-bits multiplies-free form), expressible identically in ANSI
  * SQL — so the key itself is oracle-checkable like every other
  * operator.
  */
object Layout {

  /** Bit-spread for 16-bit values: inserts a zero between consecutive
    * bits (0b1011 → 0b1000101). Shift-or-mask ladder, no loops — four
    * codegen-friendly integer ops. */
  private def spread16(c: Column): Column = {
    val m1 = lit(0x00FF00FFL)
    val m2 = lit(0x0F0F0F0FL)
    val m3 = lit(0x33333333L)
    val m4 = lit(0x55555555L)
    val s1 = (c.bitwiseOR(shiftleft(c, 8))).bitwiseAND(m1)
    val s2 = (s1.bitwiseOR(shiftleft(s1, 4))).bitwiseAND(m2)
    val s3 = (s2.bitwiseOR(shiftleft(s2, 2))).bitwiseAND(m3)
    (s3.bitwiseOR(shiftleft(s3, 1))).bitwiseAND(m4)
  }

  /** The DuckDB SQL twin of [[spread16]], for oracle builders. */
  def spread16Sql(x: String): String = {
    val s1 = s"((($x) | (($x) << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  /** 32-bit Morton code of two dimensions, each truncated to its low
    * 16 bits: z = spread(x) | spread(y) << 1. Rows close in (x, y) are
    * close in z — the clustering key for [[writeZOrdered]]. */
  def zOrder2(x: Column, y: Column): Column =
    spread16(x.bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(y.bitwiseAND(lit(0xFFFFL))), 1))

  /** SQL twin of [[zOrder2]]. */
  def zOrder2Sql(x: String, y: String): String =
    s"(${spread16Sql(s"(($x) & 65535)")} | " +
      s"(${spread16Sql(s"(($y) & 65535)")} << 1))"

  /** Catalyst-Expression form of [[zOrder2]], for the `graft_zorder2`
    * SQL registration (the function registry needs a resolvable
    * expression tree, not a Column wrapper). Same shift-or-mask ladder,
    * same integer semantics. */
  def zOrder2Expr(
      x: org.apache.spark.sql.catalyst.expressions.Expression,
      y: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions._
    def spread(e: Expression): Expression = {
      def step(e: Expression, sh: Int, m: Long): Expression =
        BitwiseAnd(BitwiseOr(e, ShiftLeft(e, Literal(sh))), Literal(m))
      step(step(step(step(e, 8, 0x00FF00FFL), 4, 0x0F0F0F0FL),
        2, 0x33333333L), 1, 0x55555555L)
    }
    def low16(e: Expression): Expression = BitwiseAnd(e, Literal(0xFFFFL))
    BitwiseOr(spread(low16(x)), ShiftLeft(spread(low16(y)), Literal(1)))
  }

  /** Writes `df` as parquet clustered on the Morton key of
    * (`xCol`, `yCol`): range-partitioned into `nFiles` z-runs, sorted
    * within each — so every output file covers a contiguous z-range and
    * its min/max footers are narrow on BOTH dimensions. Range
    * partitioning samples the key distribution (no driver collect);
    * the z column itself is dropped from the output schema. */
  def writeZOrdered(
      df: DataFrame, xCol: String, yCol: String,
      path: String, nFiles: Int): Unit =
    df.withColumn("__z", zOrder2(col(xCol), col(yCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** SMALL-FILE COMPACTION — the maintenance operator every long-lived
    * 100 TB table needs: streaming/CDC ingestion leaves thousands of
    * KB-scale files per partition, and both scan planning (one listing +
    * footer read per file) and downstream task scheduling degrade
    * linearly in file count. Rewrites `inDir`'s parquet as
    * `ceil(totalBytes / targetFileBytes)` files (floor 1), sized from
    * the ACTUAL on-disk listing so the target tracks compressed bytes,
    * not row counts. `sortCols` optionally re-clusters while rewriting
    * (compaction is the natural moment to restore clustering —
    * `repartitionByRange` both bounds file count and keeps ranges
    * disjoint for min/max pruning); otherwise a round-robin
    * `repartition(n)` spreads rows evenly with no shuffle key at all.
    * Listing goes through the Hadoop `FileSystem` of the path (works on
    * HDFS/S3/local alike — a `java.io.File` walk silently lists nothing
    * on a remote FS and would collapse sizing to one file). `outDir`
    * must differ from `inDir`: overwrite-while-reading would destroy
    * the input. Returns (filesBefore, filesAfter). */
  def compactParquet(
      spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, targetFileBytes: Long,
      sortCols: Seq[String] = Nil): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    def parquetFiles(d: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val p = new Path(d)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      def walk(st: org.apache.hadoop.fs.FileStatus)
          : Seq[org.apache.hadoop.fs.FileStatus] =
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.flatMap(walk)
        else Seq(st).filter(_.getPath.getName.endsWith(".parquet"))
      if (fs.exists(p)) walk(fs.getFileStatus(p)) else Nil
    }
    val inPath = new Path(inDir)
    val outPath = new Path(outDir)
    val conf = spark.sessionState.newHadoopConf()
    require(
      inPath.getFileSystem(conf).makeQualified(inPath) !=
        outPath.getFileSystem(conf).makeQualified(outPath),
      s"compactParquet: outDir must differ from inDir ($inDir)")
    val before = parquetFiles(inDir)
    val n = math.max(1L,
      (before.map(_.getLen).sum + targetFileBytes - 1) / targetFileBytes).toInt
    val df = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.nonEmpty)
        df.repartitionByRange(n, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(n)
    shaped.write.mode("overwrite").parquet(outDir)
    // A pre-existing cached relation for outDir would keep serving the
    // overwritten listing — drop it.
    spark.catalog.refreshByPath(outDir)
    (before.size, parquetFiles(outDir).size)
  }

  /** COMPACTION PLANNING — the metadata stage in front of
    * [[compactParquet]] when the table is partitioned: given a FILE
    * LISTING (partition, file id, size), assign files to rewrite
    * groups of ≈`targetBytes` each, per partition. The assignment is
    * the standard OPTIMIZE-style greedy fill: within a partition,
    * files ordered by (size DESC, id) accumulate into a running total
    * and a file lands in group `⌊bytes-before-it / target⌋` — largest
    * files placed first (the first-fit-decreasing heuristic's ordering,
    * which keeps group overshoot bounded by one file), group totals
    * within [target-overshoot] bounds, singleton oversized files
    * isolated by construction. Pure window arithmetic — deterministic,
    * replayable, no driver loop.
    *
    * Scale shape: this operates on the LISTING, not the data — rows =
    * file count (millions at 100 TB, not billions), the one window
    * partitions by the table partition (bounded fan-in), and the
    * output is one row per planned rewrite group. The plan feeds
    * `compactParquet(..., targetFileBytes)` executions per group. */
  /** Per-FILE rewrite-group assignment — [[compactionPlan]] before its
    * final rollup: every listing row tagged with the group the greedy
    * size-DESC fill puts it in. This is the relation an EXECUTOR of
    * the plan joins back to the data (each input file's rows land in
    * exactly one rewrite group), so it is exposed on its own. */
  def compactionAssign(files: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    // Explicit ROWS frame: the default RANGE frame equals the
    // documented per-file running sum only while (size DESC, file_id)
    // is unique within a partition — duplicate listing rows would
    // become frame peers and double-count __cum, silently diverging
    // from the greedy fill (and the oracle's explicit ROWS frame).
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(partCol))
      .orderBy(col(sizeCol).desc, col(fileCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files
      .withColumn("__cum", sum(col(sizeCol)).over(w))
      .withColumn("grp",
        expr(s"CAST((__cum - $sizeCol) div $targetBytes AS BIGINT)"))
      .drop("__cum")
  }

  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
      sizeCol: String, targetBytes: Long): DataFrame =
    compactionAssign(files, partCol, fileCol, sizeCol, targetBytes)
      .groupBy(col(partCol), col("grp"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(sizeCol)).as("total_bytes"),
        max(col(sizeCol)).as("max_file_bytes"))

  /** EXECUTE a compaction plan: `rows` (the small files' data, each row
    * tagged with the file it came from via `fileCol`) joined to the
    * [[compactionAssign]] relation, shuffled once on (partition, group),
    * and written `partitionBy(partCol, grp)` — so every rewrite group
    * lands as EXACTLY ONE output file (the repartition puts a group's
    * rows in one task; the dynamic partition split writes one file per
    * (partition, grp) value per task). Returns the read-back of the
    * rewritten layout for verification.
    *
    * Scale shape: ONE equi-join of data against the listing-sized
    * assignment (no hint — AQE broadcasts a small listing, shuffles a
    * multi-million-file one) and ONE shuffle keyed by rewrite group —
    * the group is sized to `targetBytes` by construction, so per-task
    * output is bounded by the compaction target regardless of table
    * size, which is exactly OPTIMIZE's rewrite granularity. */
  def compactByPlan(rows: DataFrame, assign: DataFrame, partCol: String,
      fileCol: String, outDir: String): DataFrame = {
    val spark = rows.sparkSession
    rows.join(assign.select(col(partCol), col(fileCol), col("grp")),
        Seq(fileCol))
      .repartition(col(partCol), col("grp"))
      .write.mode("overwrite").partitionBy(partCol, "grp").parquet(outDir)
    // a pre-existing cached relation for outDir would keep serving the
    // overwritten listing — drop it before the verification read
    spark.catalog.refreshByPath(outDir)
    spark.read.parquet(outDir)
  }
}
