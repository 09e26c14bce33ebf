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
  * Plan: ONE window pass partitioned by the group keys (key cardinality
  * must scale with the data — users, devices, days — never a
  * handful-of-groups column, the round-2 window trap). Long-range: all
  * terms bounded by k²·n²·max(c)² — document the bound at the call
  * site for the caller's n and value range. */
object Anomaly {
  def zscoreOutliers(df: DataFrame, groupKeys: Seq[String],
      valueCentsCol: String, sigmas: Int = 3): DataFrame = {
    require(groupKeys.nonEmpty, "zscoreOutliers needs group keys")
    require(sigmas > 0, "sigmas must be positive")
    val w = Window.partitionBy(groupKeys.map(col): _*)
    val c = col(valueCentsCol)
    df.withColumn("__n", count(lit(1)).over(w))
      .withColumn("__s", sum(c).over(w))
      .withColumn("__q", sum(c * c).over(w))
      .filter(
        (c * col("__n") - col("__s")) * (c * col("__n") - col("__s")) >
          lit(sigmas.toLong * sigmas) *
            (col("__n") * col("__q") - col("__s") * col("__s")))
      .drop("__n", "__s", "__q")
  }
}
