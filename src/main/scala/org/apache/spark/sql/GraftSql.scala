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
