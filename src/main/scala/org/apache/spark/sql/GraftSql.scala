package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** The one sanctioned bridge from a custom Catalyst [[Expression]] to the
  * public [[Column]] API. Spark 4 made `Column(expr)` private[sql]
  * (columns wrap ColumnNodes now), so libraries shipping native
  * expressions need exactly this shim — placed in the `org.apache.spark
  * .sql` package for access, kept to a single one-liner on purpose.
  * Everything else in this project lives under `graft.*` and uses only
  * public API. */
object GraftSql {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Eagerly materialize a DataFrame into a persisted RDD and return a
    * frame whose logical plan is just that RDD (`LogicalRDD`) — the
    * iterative-algorithm primitive. Compared to `localCheckpoint()`:
    * the Catalyst plan is equally FLAT (re-analysis cost stays O(1) per
    * iteration instead of growing with the loop), but RDD lineage is
    * PRESERVED, so (a) an executor loss recomputes the partition instead
    * of failing the job, and (b) [[unpersistCheckpoint]] on a superseded
    * round frees its storage without Spark's "cannot be recomputed"
    * warning. Rows are copied before caching (toRdd reuses mutable
    * UnsafeRows — the same copy `Dataset.checkpoint` does internally). */
  def persistedView(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    ds.sparkSession.internalCreateDataFrame(rdd, ds.schema)
  }

  /** [[persistedView]] that additionally attaches MEASURED statistics
    * to the returned leaf: row count and in-memory byte size are
    * accumulated during the materialization pass and handed to the
    * `LogicalRDD` as origin stats, so STATIC planning sees the relation's
    * true size instead of `defaultSizeInBytes` (= "huge"). This is the
    * honest substitute for a forced broadcast hint (guide §3.1): a
    * drop-loser / gate relation that measures small plans as the
    * broadcast side of its join in the INITIAL plan — no shuffle map
    * stage of the probe side at all — while the same relation at
    * corpus-proportional size measures big and plans as a sort-merge
    * join; the decision is data-driven at every scale, with no cliff
    * and no driver collect beyond what the broadcast itself would do.
    * Accumulator double-counting under task retries can only OVERSTATE
    * the size (never understate toward a wrong broadcast). */
  def sizedView(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val spark = ds.sparkSession
    val bytesAcc = spark.sparkContext.longAccumulator("graft.sizedView.bytes")
    val rowsAcc = spark.sparkContext.longAccumulator("graft.sizedView.rows")
    val rdd = ds.queryExecution.toRdd.map { r =>
      val c = r.copy()
      c match {
        case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
          bytesAcc.add(u.getSizeInBytes.toLong)
        case _ => bytesAcc.add(64L) // non-unsafe rows: coarse floor
      }
      rowsAcc.add(1L)
      c
    }
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    rdd.count()
    val attrs = org.apache.spark.sql.catalyst.types.DataTypeUtils
      .toAttributes(ds.schema)
    val stats = org.apache.spark.sql.catalyst.plans.logical.Statistics(
      sizeInBytes = BigInt(math.max(1L, bytesAcc.value)),
      rowCount = Some(BigInt(math.max(0L, rowsAcc.value))))
    ofRows(spark, org.apache.spark.sql.execution.LogicalRDD(
      attrs, rdd,
      org.apache.spark.sql.catalyst.plans.physical
        .UnknownPartitioning(rdd.getNumPartitions))(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      Some(stats), None))
  }

  /** Release the storage blocks behind a [[persistedView]] (or
    * `localCheckpoint()`ed) DataFrame. Iterative algorithms that
    * materialize per round would otherwise accumulate one superseded
    * persisted RDD per iteration. The frame's plan is a `LogicalRDD`
    * wrapping the persisted RDD — private[sql], hence this shim. No-op on
    * other frames. */
  def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** [[unpersistCheckpoint]] over EVERY persisted-RDD leaf in the frame's
    * plan — for frames a producer returned with a projection (or other
    * operators) already stacked on top of its materialized result, where
    * the top-level match sees a Project and silently no-ops (e.g.
    * `connectedComponents`' final labels). Only call this on frames whose
    * LogicalRDD leaves the caller OWNS — a frame built over someone
    * else's shared persisted relation would release their storage. */
  def unpersistCheckpointTree(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Drain the Spark listener bus (private[spark]) — lets tests assert
    * "this code path launched zero jobs" without racing the async
    * listener delivery. */
  def awaitListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Serialize a DataFrame's result as ONE self-contained Arrow IPC stream
    * (schema header + record batches + end-of-stream), consumable by any
    * Arrow implementation. Batches are produced DISTRIBUTED — each
    * partition serializes its own RecordBatch message
    * (`Dataset.toArrowBatchRdd`, the same machinery `collectAsArrowToPython`
    * uses) — and only the serialized bytes travel to the driver, where the
    * stream is framed. Both APIs are private[sql], hence this shim. */
  def collectAsArrowStream(df: DataFrame): Array[Byte] = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val conf = ds.sparkSession.sessionState.conf
    // MUST mirror toArrowBatchRdd's own schema-conversion flags (verified
    // against the 4.1.2 bytecode), or the stream header can disagree with
    // the batch layout (e.g. VarChar vs LargeVarChar under
    // spark.sql.execution.arrow.useLargeVarTypes=true).
    val errorOnDup = conf.pandasStructHandlingMode == "legacy"
    val largeVarTypes = conf.arrowUseLargeVarTypes
    val batches = ds.toArrowBatchRdd.collect()
    val out = new java.io.ByteArrayOutputStream()
    val writer = new org.apache.spark.sql.execution.arrow.ArrowBatchStreamWriter(
      ds.schema, out, conf.sessionLocalTimeZone, errorOnDup, largeVarTypes)
    writer.writeBatches(batches.iterator)
    writer.end()
    out.toByteArray
  }
}
