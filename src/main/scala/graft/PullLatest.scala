package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.FeatureView
import graft.sources.FeatureSource

/** Latest-per-key extraction over a time range — the materialization entry
  * point (ref: feast_hive/hive.py:143-190, `pull_latest_from_table_or_query`).
  *
  * For each distinct join-key combination, return the single newest row with
  * `event_ts BETWEEN start AND end` (inclusive both ends, ref hive.py:183),
  * newest = greatest event ts, ties broken by greatest created ts
  * (ref: ROW_NUMBER ... ORDER BY ts DESC, created DESC, hive.py:159-168).
  * With no join keys the reference omits PARTITION BY entirely — a global
  * top-1 — and projects a literal dummy entity id (ref: hive.py:160-163,178).
  *
  * Plan: the BETWEEN literals push into the Parquet scan; the window is the
  * single shuffle, keyed on the join keys (so it scales with key
  * cardinality). The keyless branch does NOT reproduce the reference's
  * global window (hive.py:160-163 — every range-surviving row through one
  * partition): it computes the same global top-1 as a
  * `max(struct(orderKeys…, payload…))` aggregate — map-side partial maxima,
  * one row per partition shuffled — which stays scalable however wide the
  * BETWEEN range is. Struct comparison is lexicographic and nulls sort
  * low, matching the window's `DESC` (nulls last) tie semantics.
  */
object PullLatest {

  private val Rn = "feast_row_" // ref: hive.py:185

  def pullLatest(
      spark: SparkSession,
      source: FeatureSource,
      joinKeys: Seq[String],
      featureNames: Seq[String],
      eventTsCol: String,
      createdTsCol: Option[String],
      startDate: Timestamp,
      endDate: Timestamp,
      tieBreakColumns: Seq[String] = Nil): DataFrame = {
    val src = source.resolve(spark)
    val ranged =
      src.filter(col(eventTsCol).between(lit(startDate), lit(endDate))) // P6

    if (joinKeys.isEmpty) {
      // ref: hive.py:160-163,178 — keyless = global top-1 + literal dummy
      // entity id. Computed as max_by(payload struct, order struct) so the
      // partial maxima combine map-side; ONLY the order columns are
      // compared (desc ≡ lexicographic max — features may be maps or
      // other unorderable types, and must not influence the pick), while
      // the payload struct carries the whole output row back. Full ties
      // on every order column resolve arbitrarily, exactly like the
      // window formulation's unstable sort.
      val orderCols =
        (eventTsCol +: createdTsCol.toSeq) ++ tieBreakColumns
      val outCols = featureNames ++ (eventTsCol +: createdTsCol.toSeq)
      ranged
        .agg(max_by(
          struct(outCols.distinct.map(col): _*),
          struct(orderCols.map(col): _*)).as("__graft_top"))
        .filter(col("__graft_top").isNotNull) // empty range → 0 rows, not 1
        .select(
          lit(FeatureView.DummyEntityVal).as(FeatureView.DummyEntityId) +:
            outCols.map(c => col("__graft_top").getField(c).as(c)): _*)
    } else {
      val order: Seq[Column] =
        (col(eventTsCol).desc +: createdTsCol.map(c => col(c).desc).toSeq) ++
          tieBreakColumns.map(col(_).desc)
      val w = Window.partitionBy(joinKeys.map(col): _*).orderBy(order: _*)

      // ref: hive.py:168 field_string — join keys + features + ts columns.
      val outCols = joinKeys ++ featureNames ++ (eventTsCol +: createdTsCol.toSeq)
      ranged
        .withColumn(Rn, row_number().over(w)) // W1
        .filter(col(Rn) === 1) // P7
        .select(outCols.map(col): _*) // P1/P5
    }
  }
}
