package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers — the manual fallbacks for when AQE's runtime
  * skew handling (`spark.sql.adaptive.skewJoin.enabled`, on by default)
  * is not enough: AQE only splits SHUFFLE partitions of sort-merge joins;
  * a single hot GROUP BY key or a hot broadcast-probe key still lands on
  * one task. Both helpers are exact — results equal their unsalted
  * formulations, verified in SkewSpec.
  */
object Skew {

  /** Two-phase salted aggregation for decomposable aggregates: partial
    * aggregate over (keys + salt), then final aggregate over keys. The
    * salt spreads one hot key over `buckets` tasks in phase one; phase
    * two combines `buckets` rows per key — exact for any
    * commutative-monoid aggregate (sum/count/min/max).
    *
    * `partials` maps an input column to its phase-one aggregate;
    * `finals` combines the phase-one column to the final value, aliased
    * to the SAME name. Example — exact count + sum under skew:
    * {{{
    * Skew.saltedAggregate(df, Seq("user_id"), 16,
    *   partials = Seq(count(lit(1)).as("n"), sum("value").as("s")),
    *   finals   = Seq(sum("n").as("n"), sum("s").as("s")))
    * }}}
    */
  /** Deterministic per-row salt: a content hash, so shuffle-stage
    * recomputation after executor loss regenerates IDENTICAL salts (a
    * nondeterministic salt is the repartition-by-rand correctness bug,
    * SPARK-23207 — retried map tasks would disagree with already-fetched
    * outputs). Identical duplicate rows share a salt; real skewed data
    * varies in non-key columns, which is what spreads the hot key. */
  private def contentSalt(df: DataFrame, buckets: Int): Column =
    pmod(hash(df.columns.map(col): _*), lit(buckets))

  def saltedAggregate(
      df: DataFrame, keys: Seq[String], buckets: Int,
      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__graft_salt", contentSalt(df, buckets))
    salted
      .groupBy((keys :+ "__graft_salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }

  /** Salted equi-join for a skewed PROBE side against a small build side:
    * the big side gets a deterministic salt in [0, buckets); the small
    * side is replicated once per salt value (explode of a literal range —
    * |small|·buckets rows, still broadcastable). The join key becomes
    * (key, salt), so one hot key spreads over `buckets` tasks. Exact:
    * every (bigRow, smallRow) match pairs exactly once. */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    // Right/full outer would emit each unmatched SMALL row once per
    // replica (buckets× duplication); only probe-side-preserving types
    // are correct under replication.
    val allowed = Set("inner", "left", "leftouter", "left_outer",
      "leftsemi", "left_semi", "leftanti", "left_anti")
    require(allowed.contains(joinType.toLowerCase),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched " +
        "build-side rows across salt replicas; use inner/left variants")
    val saltedBig = big.withColumn("__graft_salt",
      contentSalt(big, buckets).cast("int"))
    val replicatedSmall = small.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig
      .join(broadcast(replicatedSmall), Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }
}
