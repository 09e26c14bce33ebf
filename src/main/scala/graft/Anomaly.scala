package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical outlier detection over grouped numeric columns — the
  * data-quality sibling of the one-pass profiler: flag rows more than
  * `sigmas` standard deviations from their group mean.
  *
  * The z-score test is algebraized to EXACT integer arithmetic:
  * with c the quantized value, n the group count, S = Σc, Q = Σc²,
  *
  *   |c − μ| > kσ  ⟺  (c·n − S)² > k²·(n·Q − S²)
  *
  * so there is no mean, no variance, no division and no FP anywhere for
  * engines (or partitionings) to disagree on. σ = 0 and n = 1 groups
  * flag nothing by construction (both sides 0, strict >).
  *
  * Plan: window passes partitioned by the group keys (key cardinality
  * must scale with the data — users, devices, days — never a
  * handful-of-groups column, the round-2 window trap). The guard pass
  * and the sum pass share the window spec, so there is still exactly
  * ONE shuffle+sort; the second Window exec reuses the partitioning.
  *
  * Long-range SAFETY is enforced at runtime, not by call-site
  * documentation: every term is bounded by max(4, k²)·n²·max(|c|)²
  * (LHS ≤ (2·n·max)², RHS ≤ k²·n²·max²), so the test is exact iff
  * n·max(|c|) ≤ √(Long.Max / max(4, k²)). The guard (count and
  * per-group max, compared in Decimal so the guard itself cannot
  * wrap) is computed FIRST, and S/Q only accumulate for groups that
  * pass it — a group that would overflow produces NULL sums, never a
  * wrapped value (ANSI off) or an engine overflow error firing before
  * the diagnostic one (ANSI on). The filter then raises a named
  * `assert_true` error for any guarded-out group. */
object Anomaly {
  def zscoreOutliers(df: DataFrame, groupKeys: Seq[String],
      valueCentsCol: String, sigmas: Int = 3): DataFrame = {
    require(groupKeys.nonEmpty, "zscoreOutliers needs group keys")
    require(sigmas > 0, "sigmas must be positive")
    val k2 = sigmas.toLong * sigmas
    // exact iff n·max(|c|) stays under this bound (see scaladoc)
    val safeNM = math.sqrt(Long.MaxValue.toDouble / math.max(4L, k2)).toLong - 1
    val w = Window.partitionBy(groupKeys.map(col): _*)
    val c = col(valueCentsCol)
    // Window expressions are not allowed inside a WHERE clause, so the
    // aggregates must materialize as columns — with names generated to
    // never shadow (and then silently drop) a caller column.
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"${base}_$i")
        .find(n => !df.columns.contains(n)).get
    val (nC, mC, gC, sC, qC) = (fresh("__zs_n"), fresh("__zs_m"),
      fresh("__zs_g"), fresh("__zs_s"), fresh("__zs_q"))
    // pass 1: count and max(|c|) — abs and the n·m product in Decimal so
    // the GUARD arithmetic itself cannot overflow for any long input
    val guarded = df
      .withColumn(nC, count(lit(1)).over(w))
      .withColumn(mC, max(abs(c.cast("decimal(20,0)"))).over(w))
      .withColumn(gC,
        // An all-NULL group has mC = NULL, which would make the guard NULL
        // and assert_true(NULL) raise a misleading overflow error; such a
        // group cannot overflow anything, so it passes the guard (and then
        // falls out of the outlier filter on NULL arithmetic, as before).
        coalesce(col(nC).cast("decimal(19,0)") * col(mC) <= lit(safeNM),
          lit(true)))
    // pass 2 (same window spec — partitioning/sort reused, no second
    // shuffle): S and Q accumulate ONLY under the guard, so a group past
    // the bound yields NULLs instead of wrapped/overflowing longs
    val g = col(gC)
    val out = guarded
      .withColumn(sC, sum(when(g, c)).over(w))
      .withColumn(qC, sum(when(g, c * c)).over(w))
    val (n, s, q) = (col(nC), col(sC), col(qC))
    // assert_true returns NULL when the guard holds and raises otherwise;
    // keeping it inside the filter conjunction (rather than a dropped
    // column) means Catalyst cannot prune it away.
    val loud = assert_true(g,
      lit(s"zscoreOutliers: n*max(|$valueCentsCol|) exceeds the exact-Long " +
        s"bound $safeNM for sigmas=$sigmas; rescale the value column"))
    out.filter(loud.isNull &&
        (c * n - s) * (c * n - s) > lit(k2) * (n * q - s * s))
      .drop(nC, mC, gC, sC, qC)
  }

  /** WINSORIZATION — robust per-group outlier CLIPPING (the feature-
    * engineering counterpart of [[zscoreOutliers]]'s flagging): every
    * value is clamped into [cut(loPermille), cut(hiPermille)] of its
    * OWN group's distribution, the standard tail-taming transform for
    * skewed features (Tukey; the p1/p99 clip every feature store
    * applies before scaling). Rows keep their identity — only the new
    * `<valueCol>_w` column changes.
    *
    * Cuts are EXACT integer-rank order statistics (the p-th permille =
    * the ⌈p·n/1000⌉-th smallest value, never an interpolated float)
    * from [[graft.llm.Sampling.groupPermilleCuts]]'s two-level binned
    * scan — no per-group global sort, windows bounded by bin
    * resolution. The ≤ 2·|groups|-row cut table broadcasts; the clamp
    * is one per-row `least(greatest(...))`. Deterministic and
    * engine-exact on quantized (long) values. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      loPermille: Int = 50, hiPermille: Int = 950,
      binWidth: Long = 1000L): DataFrame = {
    require(loPermille < hiPermille, "need loPermille < hiPermille")
    val cuts = graft.llm.Sampling
      .groupPermilleCuts(df, groupCol, valueCol,
        Seq(loPermille, hiPermille), binWidth)
      .groupBy("group_key")
      .agg(
        min(when(col("permille") === loPermille, col("cut"))).as("__lo"),
        min(when(col("permille") === hiPermille, col("cut"))).as("__hi"))
    df.join(broadcast(cuts), df(groupCol) === cuts("group_key"))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("group_key", "__lo", "__hi")
  }
}
