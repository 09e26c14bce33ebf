package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — "how many users View → Click → Purchase,
  * in that order": for each key, walk its time-ordered event stream and
  * count how many funnel stages are completed in sequence (a stage
  * matches only after every earlier stage already has).
  *
  * Plan: ONE groupBy collects each key's (ts, tie, type) events,
  * `array_sort` orders them per key (partition-local, no window), and
  * the stage walk is a codegen'd `aggregate` HOF with an integer state —
  * no UDF, no driver loop. Output row per stage: keys reaching it.
  * Scales with key cardinality; per-key event lists are the only
  * memory-bound (same bound any per-key sessionization has).
  *
  * All arithmetic is integer/string equality — exactly reproducible in
  * ANSI SQL (driver-gated oracle).
  */
object Funnel {

  /** Cohort retention: bucket each key by its FIRST-seen week (the
    * cohort), then count distinct keys active in each later week —
    * the (cohort_week, week_offset, n_keys) retention triangle.
    *
    * Weeks are integer epoch-week indices (`epoch_us // (7·86400·10^6)`)
    * — pure integer arithmetic, no date-type drift. Plan: one
    * distinct over (key, week), one min-per-key aggregation (broadcast-
    * able — one row per key), one counting aggregation. All keyed
    * shuffles. */
  def retention(
      df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val wk = floor(unix_micros(col(tsCol)) / lit(604800000000L))
      .cast("long")
    val active = df.select(col(keyCol), wk.as("week")).distinct()
    val cohort = active.groupBy(col(keyCol))
      .agg(min(col("week")).as("cohort_week"))
    active.join(cohort, keyCol)
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_keys"))
  }

  def funnel(
      df: DataFrame, keyCol: String, tsCol: String, tieBreakCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val n = stages.length
    val stageLit = typedlit(stages)
    val ordered = df
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(
        col(tsCol).as("ts"), col(tieBreakCol).as("tb"),
        col(typeCol).as("t")))).as("evs"))
      .select(col(keyCol),
        transform(col("evs"), e => e.getField("t")).as("types"))
    val reached = ordered.select(
      col(keyCol),
      aggregate(col("types"), lit(0), (acc, t) =>
        when(acc < n && t === element_at(stageLit, acc + 1), acc + 1)
          .otherwise(acc)).as("reached"))
    reached
      .filter(col("reached") >= 1)
      .select(explode(sequence(lit(1), col("reached"))).as("stage_idx"))
      .groupBy("stage_idx")
      .agg(count(lit(1)).as("n_keys"))
      .select(col("stage_idx"),
        element_at(stageLit, col("stage_idx")).as("stage"),
        col("n_keys"))
  }
}
