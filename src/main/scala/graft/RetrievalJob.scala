package graft

import org.apache.spark.sql.{DataFrame, Row}

/** Lazy handle over a retrieval: nothing executes until a terminal method
  * (ref: feast_hive/hive.py:272-360, `HiveRetrievalJob` — a deferred query
  * generator plus columnar fetch; here the DataFrame itself IS the deferred
  * plan, so no statement list or Arrow marshalling layer is needed).
  *
  * `transforms` mirror the reference's on-demand-feature-view pass-through
  * (ref: hive.py:266-268,309-311): client-side post-transformations applied
  * on materialization, kept as plan-to-plan functions so they stay inside
  * Catalyst.
  */
final class RetrievalJob(
    thunk: () => DataFrame,
    transforms: Seq[DataFrame => DataFrame] = Nil) {

  /** The composed plan. Lazy and cached: repeated calls reuse one plan. */
  lazy val toDF: DataFrame =
    transforms.foldLeft(thunk())((df, f) => f(df))

  /** ref: hive.py:313-332 (`_to_df_internal` / `_to_arrow_internal`) — the
    * driver-side result fetch. Spark's collect is already columnar
    * (Arrow-backed) internally; rows are the JVM-native interchange. */
  def collectRows(): Array[Row] = toDF.collect()

  /** S9 full Arrow parity (ref: hive.py:313-352, `_to_arrow_internal`
    * returns a pyarrow Table): the result as a complete Arrow IPC stream —
    * schema header plus one record batch per partition — ready to hand to
    * pandas/polars/pyarrow/arrow-vector tooling without row conversion.
    * Partitions serialize their batches in parallel; only the Arrow bytes
    * reach the driver. */
  def collectAsArrow(): Array[Byte] =
    org.apache.spark.sql.GraftSql.collectAsArrowStream(toDF)

  def count(): Long = toDF.count()

  /** S3-style sink: persist the result as Parquet. */
  def writeParquet(path: String): Unit =
    toDF.write.mode("overwrite").parquet(path)

  /** Append a post-transform (odfv-equivalent), preserving laziness. */
  def withTransform(f: DataFrame => DataFrame): RetrievalJob =
    new RetrievalJob(thunk, transforms :+ f)
}

object RetrievalJob {
  def apply(df: => DataFrame): RetrievalJob = new RetrievalJob(() => df)
}
