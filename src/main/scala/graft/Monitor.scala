package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring over event streams — the operational
  * companion of a feature store's offline plugin (the reference's
  * `get_historical_features` consumers retrain when features drift;
  * this module is the detector that tells them to). Reference scope
  * ends at retrieval (`hive.py:192-269`); drift monitoring is an
  * extension in the same event-table data model.
  *
  * Every statistic is algebraized so two independent engines (and any
  * partitioning) produce BIT-IDENTICAL results — the same discipline as
  * [[Anomaly.zscoreOutliers]]:
  *
  *  - **Total variation distance** between the reference and current
  *    windows is computed as the exact integer
  *    `Σ_bins |n_cur·N_ref − n_ref·N_cur|` and divided ONCE at the end
  *    by `2·N_ref·N_cur` — no per-bin proportion doubles to sum in an
  *    order-dependent way.
  *  - **Kolmogorov–Smirnov distance** is the exact integer
  *    `max_v |cumRef(v)·N_cur − cumCur(v)·N_ref|` over the aggregated
  *    distinct-value relation, divided once.
  *  - **PSI** needs `ln`, so it follows the repo's FP protocol instead
  *    (the `text_bm25` class): per-bin contributions are rounded to 9
  *    decimals before the ≤`nBins`-term sum, and the sum to 6 — the
  *    summation-order ulp (~1e-15) cannot cross a 1e-6 boundary.
  *
  * The time split itself is relational: the pivot comes from a 1-row
  * min/max aggregate broadcast back over the stream (`tus·2 < lo+hi`
  * — integer compare, no division), so there is no driver collect and
  * no float midpoint for engines to disagree on.
  *
  * Scale: every operator is one scan + map-side-combinable aggregation
  * on `(group, bin)` / `(group, value)` keys. The only window pass
  * ([[ksStat]]) runs over the ALREADY-AGGREGATED distinct-value
  * relation — bounded by value cardinality (≤ 2¹⁷ distinct cents for a
  * $0–$1,300 range), not event count — so the handful-of-groups window
  * trap does not bite: the windowed input is KB–MB per group at any
  * corpus size. Long-exactness bound: products are ≤ N_ref·N_cur, so
  * results are exact iff each split side holds ≤ √Long.Max ≈ 3.0e9
  * rows per group — beyond that, shard the monitor by day/tenant (the
  * operationally correct granularity anyway) or pre-aggregate grains.
  */
object Monitor {

  /** Tags each row with `__is_ref` (1 = reference window) by the exact
    * integer midpoint test `2·t < lo+hi` over the observed range of
    * `tsCol`. One extra 1-row aggregate, broadcast — no driver scalar,
    * no timestamp division. */
  def midpointSplit(df: DataFrame, tsCol: String): DataFrame = {
    val b = df.agg(
      min(unix_micros(col(tsCol))).as("__lo"),
      max(unix_micros(col(tsCol))).as("__hi"))
    df.crossJoin(broadcast(b))
      .withColumn("__is_ref",
        (unix_micros(col(tsCol)) * 2 < col("__lo") + col("__hi"))
          .cast("int"))
      .drop("__lo", "__hi")
  }

  /** Reference = the first `days` days of the stream (the bootstrap
    * window a monitor is seeded with); everything after is current. */
  def headDaysSplit(df: DataFrame, tsCol: String, days: Int): DataFrame = {
    val b = df.agg(min(unix_micros(col(tsCol))).as("__lo"))
    df.crossJoin(broadcast(b))
      .withColumn("__is_ref",
        (unix_micros(col(tsCol)) <
          col("__lo") + lit(days.toLong * 86400000000L)).cast("int"))
      .drop("__lo")
  }

  /** Per-(group, bin) contingency counts: `cents` clamped non-negative
    * (integer `div` truncates toward zero in Spark but floors in some
    * engines — identical only on non-negatives), bucketed into
    * `nBins` equal-width bins of `stepCents`, top bin open. Output:
    * group, bin, n_ref, n_cur — the shared input of [[driftBins]] /
    * [[driftStats]]. One map-side-combinable aggregation. */
  def binnedCounts(df: DataFrame, groupCol: String, centsCol: String,
      isRefCol: String, stepCents: Long, nBins: Int): DataFrame =
    df.select(col(groupCol), col(centsCol), col(isRefCol))
      .withColumn("__c", greatest(col(centsCol), lit(0L)))
      .withColumn("bin",
        least(expr(s"__c div $stepCents"), lit(nBins.toLong - 1)))
      .groupBy(col(groupCol), col("bin"))
      .agg(sum(col(isRefCol)).cast("long").as("n_ref"),
        sum(lit(1) - col(isRefCol)).cast("long").as("n_cur"))

  /** Per-bin drift detail over [[binnedCounts]] output: the exact
    * integer cross-product difference
    * `diff_scaled = n_cur·N_ref − n_ref·N_cur` (positive ⇒ the bin
    * gained mass). The totals join is a ≤|groups|-row broadcast. */
  def driftBins(binned: DataFrame, groupCol: String): DataFrame = {
    val tot = binned.groupBy(groupCol).agg(
      sum(col("n_ref")).as("__nr"), sum(col("n_cur")).as("__nc"))
    binned.join(broadcast(tot), groupCol)
      .select(col(groupCol), col("bin"), col("n_ref"), col("n_cur"),
        (col("n_cur") * col("__nr") - col("n_ref") * col("__nc"))
          .as("diff_scaled"))
  }

  /** Per-group drift summary: totals, exact-integer scaled TVD, the
    * float TVD (ONE division at the end), and Laplace-smoothed PSI over
    * the observed bins (smoothing denominator = observed bin count, so
    * both engines smooth over the identical support). */
  def driftStats(binned: DataFrame, groupCol: String): DataFrame = {
    val tot = binned.groupBy(groupCol).agg(
      sum(col("n_ref")).as("__nr"), sum(col("n_cur")).as("__nc"),
      count(lit(1)).as("__nb"))
    val pr = (col("n_ref") + 1).cast("double") /
      (col("__nr") + col("__nb")).cast("double")
    val pc = (col("n_cur") + 1).cast("double") /
      (col("__nc") + col("__nb")).cast("double")
    // Degenerate-split guard (ADVICE r13): a group whose rows all land
    // on one side (e.g. a single distinct timestamp — midpointSplit's
    // strict 2·t < lo+hi puts everything in "current" when lo == hi)
    // has N_ref·N_cur = 0; under ANSI mode the terminal division would
    // RAISE DIVIDE_BY_ZERO and kill the whole monitor job for one
    // silent group. Emit NULL tvd/psi as the detectable sentinel
    // instead (tvd_scaled stays — it is exact and well-defined at 0).
    val ok = max(col("__nr")) > 0 && max(col("__nc")) > 0
    binned.join(broadcast(tot), groupCol)
      .withColumn("__diff",
        col("n_cur") * col("__nr") - col("n_ref") * col("__nc"))
      .withColumn("__contrib", round((pc - pr) * log(pc / pr), 9))
      .groupBy(groupCol)
      .agg(max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cur"),
        sum(abs(col("__diff"))).as("tvd_scaled"),
        when(ok, sum(abs(col("__diff"))).cast("double") /
          (lit(2.0) * max(col("__nr")).cast("double") *
            max(col("__nc")).cast("double"))).as("tvd"),
        when(ok, round(sum(col("__contrib")), 6)).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov distance per group, exact-integer
    * form. Input: one row per (group, value) with ref/cur counts (from
    * a groupBy over the tagged stream). The cumulative pass runs on
    * that aggregated relation — its size is the group's distinct-value
    * cardinality, not its row count — ordered by value (distinct ⇒ no
    * frame ties). Output: group, n_ref, n_cur, ks_scaled, ks. */
  def ksStat(valueCounts: DataFrame, groupCol: String): DataFrame = {
    val wCum = Window.partitionBy(groupCol).orderBy(col("value"))
    val wAll = Window.partitionBy(groupCol)
    // same degenerate-split sentinel as driftStats (ADVICE r13): an
    // empty window side makes the normalizing product 0 — NULL ks, no
    // ANSI DIVIDE_BY_ZERO, exact ks_scaled (0) kept
    val ok = max(col("__nr")) > 0 && max(col("__nc")) > 0
    valueCounts
      .withColumn("__cr", sum(col("n_ref")).over(wCum))
      .withColumn("__cc", sum(col("n_cur")).over(wCum))
      .withColumn("__nr", sum(col("n_ref")).over(wAll))
      .withColumn("__nc", sum(col("n_cur")).over(wAll))
      .groupBy(groupCol)
      .agg(max(col("__nr")).as("n_ref"), max(col("__nc")).as("n_cur"),
        max(abs(col("__cr") * col("__nc") - col("__cc") * col("__nr")))
          .as("ks_scaled"),
        when(ok,
          max(abs(col("__cr") * col("__nc") - col("__cc") * col("__nr")))
            .cast("double") /
            (max(col("__nr")).cast("double") *
              max(col("__nc")).cast("double"))).as("ks"))
  }

  /** Categories present in the current window but absent from the
    * reference — the schema/vocabulary-drift alarm (a new enum value, a
    * new event source, a new tenant). One aggregation on the category
    * key; emits the current-window support and first-seen timestamp. */
  def newCategories(df: DataFrame, catCol: String, isRefCol: String,
      tsCol: String): DataFrame =
    df.groupBy(col(catCol))
      .agg(sum(col(isRefCol)).as("__nr"),
        sum(lit(1) - col(isRefCol)).cast("long").as("n_cur"),
        min(when(col(isRefCol) === 0, col(tsCol))).as("first_seen"))
      .filter(col("__nr") === 0 && col("n_cur") > 0)
      .select(col(catCol), col("n_cur"), col("first_seen"))
}
