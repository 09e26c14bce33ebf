package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — the event-pipeline primitive behind
  * "sessions", retention, and per-visit training examples: order each
  * key's events by time and start a new session whenever the gap to the
  * previous event exceeds `gapSeconds`.
  *
  * Plan: ONE key-partitioned window computes the session break flags and
  * their running sum (two window functions over the same frame — one
  * shuffle total), then an optional per-(key, session) aggregation.
  * Everything is keyed on the entity — scales with key cardinality, no
  * global ordering anywhere. Gap arithmetic is integer microseconds and
  * ties order by (ts, tieBreak), so the result is deterministic and
  * exactly reproducible in ANSI SQL (driver-gated oracle).
  */
object Sessionize {

  /** Per-event session assignment: input columns plus `session_idx`
    * (0-based, per key, in time order). */
  def assign(
      df: DataFrame, keyCol: String, tsCol: String, tieBreakCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    val order: Seq[Column] = Seq(col(tsCol), col(tieBreakCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val brk = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L,
      lit(1L)).otherwise(lit(0L))
    df.withColumn("session_idx",
      sum(brk).over(w.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)) - 1)
  }

  /** One row per (key, session): event count and time bounds. */
  def sessions(
      df: DataFrame, keyCol: String, tsCol: String, tieBreakCol: String,
      gapSeconds: Long): DataFrame =
    assign(df, keyCol, tsCol, tieBreakCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
