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
  * cardinality). The keyless branch funnels the range-filtered rows through
  * one partition — same as the reference's global window, and only correct
  * to use when the range is narrow; callers wanting a scalable global top-1
  * should prefer a `max_by` aggregation.
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
    // ref: hive.py:160-163,178 — dummy entity for keyless sources.
    val keyless = joinKeys.isEmpty
    val keyed =
      if (keyless)
        src.withColumn(FeatureView.DummyEntityId, lit(FeatureView.DummyEntityVal))
      else src
    val keys = if (keyless) Seq(FeatureView.DummyEntityId) else joinKeys

    val order: Seq[Column] =
      (col(eventTsCol).desc +: createdTsCol.map(c => col(c).desc).toSeq) ++
        tieBreakColumns.map(col(_).desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)

    // ref: hive.py:168 field_string — join keys + features + ts columns.
    val outCols = keys ++ featureNames ++ (eventTsCol +: createdTsCol.toSeq)
    keyed
      .filter(col(eventTsCol).between(lit(startDate), lit(endDate))) // P6
      .withColumn(Rn, row_number().over(w)) // W1
      .filter(col(Rn) === 1) // P7
      .select(outCols.map(col): _*) // P1/P5
  }
}
