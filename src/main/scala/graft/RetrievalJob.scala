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
    transforms: Seq[DataFrame => DataFrame] = Nil,
    scope: RetrievalJob.ConfScope = RetrievalJob.NoScope) {

  /** The composed plan. Lazy and cached: repeated calls reuse one plan.
    * Built under the engine's conf scope; note that ACTING on this frame
    * outside the terminal methods below runs with the session's normal
    * conf — use the terminal methods for reference-faithful S10
    * execution-time overlay semantics. */
  lazy val toDF: DataFrame =
    scope(transforms.foldLeft(thunk())((df, f) => f(df)))

  /** ref: hive.py:313-332 (`_to_df_internal` / `_to_arrow_internal`) — the
    * driver-side result fetch. Spark's collect is already columnar
    * (Arrow-backed) internally; rows are the JVM-native interchange. */
  def collectRows(): Array[Row] = scope(toDF.collect())

  /** S9 full Arrow parity (ref: hive.py:313-352, `_to_arrow_internal`
    * returns a pyarrow Table): the result as a complete Arrow IPC stream —
    * schema header plus one record batch per partition — ready to hand to
    * pandas/polars/pyarrow/arrow-vector tooling without row conversion.
    * Partitions serialize their batches in parallel; only the Arrow bytes
    * reach the driver. */
  def collectAsArrow(): Array[Byte] =
    scope(org.apache.spark.sql.GraftSql.collectAsArrowStream(toDF))

  def count(): Long = scope(toDF.count())

  /** S3-style sink: persist the result as Parquet. */
  def writeParquet(path: String): Unit =
    scope(toDF.write.mode("overwrite").parquet(path))

  /** Append a post-transform (odfv-equivalent), preserving laziness. */
  def withTransform(f: DataFrame => DataFrame): RetrievalJob =
    new RetrievalJob(thunk, transforms :+ f, scope)
}

object RetrievalJob {
  /** Polymorphic around-advice for terminal actions: the Engine supplies
    * its session-conf overlay here so S10 confs consumed at EXECUTION
    * time (physical planning runs at the first action, e.g.
    * spark.sql.shuffle.partitions) are live for the action and restored
    * after — reference semantics (SET statements prefixed to the query
    * batch, hive.py:249-254) without leaking into the shared session. */
  trait ConfScope { def apply[A](body: => A): A }
  val NoScope: ConfScope = new ConfScope { def apply[A](body: => A): A = body }

  def apply(df: => DataFrame): RetrievalJob = new RetrievalJob(() => df)

  def apply(df: => DataFrame, scope: ConfScope): RetrievalJob =
    new RetrievalJob(() => df, Nil, scope)
}
