package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed POINT-IN-INTERVAL join — `point.ts ∈ [start, end)` with NO
  * equi key — via coarse time-bucketing.
  *
  * The naive plan for a keyless range join is a broadcast nested loop
  * (every point × every interval — quadratic, and the audit forbids it).
  * The scale shape instead makes the range condition EQUI-JOINABLE:
  * replicate each interval into every `bucketSeconds`-wide coarse bucket
  * it overlaps (`explode(sequence(⌊start/w⌋, ⌊end/w⌋))`), tag each point
  * with its single bucket, hash-join on the bucket id, and decide
  * containment with the exact residual predicate on the raw timestamps.
  * Every true (point, interval) pair shares the point's bucket, so the
  * candidate set is a superset of the answer (lossless); each pair is
  * produced at most once (a point lives in exactly one bucket).
  *
  * Scale tuning: interval-side replication is `len/w + 1` rows per
  * interval and per-bucket work is (points in bucket) × (intervals
  * overlapping it), so pick `w` near the TYPICAL interval length —
  * shorter buckets cut in-bucket interval density at linear replication
  * cost. Bucket hot spots (many concurrent intervals — an outage window
  * over a traffic spike) are ordinary shuffle-key skew: AQE's skew-join
  * splitting applies as-is, [[Skew]]-style salting if it doesn't.
  *
  * Column contract: `points` and `intervals` must not share column
  * names (select/alias first); all columns of both sides pass through.
  * Empty or inverted intervals (`end <= start`) match nothing and are
  * dropped before replication (`sequence` would otherwise step
  * backwards). Reference scope: extension surface — the reference
  * delegates all join physical planning to its engine (hive.py:38-40);
  * this is the Spark-first shape of the one range-join form the PIT
  * family (equi-keyed, as-of) doesn't cover. */
object IntervalJoin {

  /** INTERVAL-OVERLAP join — `[aStart, aEnd) ∩ [bStart, bEnd) ≠ ∅` —
    * by the same coarse-bucket replication, with the standard
    * CANONICAL-BUCKET dedup: two overlapping intervals co-occur in
    * every bucket their overlap touches, so the join additionally
    * requires the bucket to be the one containing the overlap's START
    * (`⌊max(aStart, bStart)/w⌋`) — each qualifying pair is emitted
    * EXACTLY once, no distinct pass over the pair relation. Same
    * column-name, replication-cost and skew story as
    * [[pointInInterval]]. */
  def intervalOverlap(
      a: DataFrame, aStartCol: String, aEndCol: String,
      b: DataFrame, bStartCol: String, bEndCol: String,
      bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0, got $bucketSeconds")
    val w = lit(bucketSeconds)
    def expand(df: DataFrame, s: String, e: String, out: String) = df
      .filter(col(s) < col(e))
      .withColumn(out, explode(sequence(
        floor(col(s).cast("long") / w), floor(col(e).cast("long") / w))))
    val ea = expand(a, aStartCol, aEndCol, "__graft_ab")
    val eb = expand(b, bStartCol, bEndCol, "__graft_bb")
    val overlapStart = greatest(col(aStartCol), col(bStartCol))
    ea.join(eb,
        col("__graft_ab") === col("__graft_bb") &&
          col(aStartCol) < col(bEndCol) && col(bStartCol) < col(aEndCol) &&
          col("__graft_ab") === floor(overlapStart.cast("long") / w))
      .drop("__graft_ab", "__graft_bb")
  }

  /** FORWARD AS-OF JOIN — for each anchor row, the FIRST event of the
    * same key strictly after the anchor's timestamp and within
    * `horizonSeconds` — the next-action attribution shape (next click
    * after an impression, next purchase after a visit) that the PIT
    * family's backward as-of cannot express by symmetry (its TTL looks
    * back; attribution looks forward).
    *
    * Plan: equi-join on `keys` with the range residual
    * `anchor.ts < e.ts <= anchor.ts + horizon` (Catalyst/AQE pick
    * hash/SMJ/broadcast as sizes dictate — J2's license), then ONE
    * map-side-combinable `min(struct(ts, id))` winner per anchor (total
    * order — ties on ts break by event id, bit-identical across
    * engines), and a final LEFT attachment so anchors with no
    * successor survive with NULLs (J4's convention). Per-anchor
    * candidate volume is bounded by the key's event rate × horizon —
    * the same argument that sizes the backward TTL join.
    *
    * Returns all of `anchors`' columns plus `(next_event_id, next_ts)`.
    * `anchors` must carry a unique `anchorIdCol`; `keys` must be
    * non-empty (the keyless forward form is [[pointInInterval]] +
    * a winner aggregate). */
  def firstAfterWithin(
      anchors: DataFrame, anchorIdCol: String, anchorTsCol: String,
      events: DataFrame, eventIdCol: String, eventTsCol: String,
      keys: Seq[String], horizonSeconds: Long): DataFrame = {
    require(keys.nonEmpty, "firstAfterWithin needs equi keys")
    require(horizonSeconds > 0, "horizonSeconds must be > 0")
    val e = events.select(
      (keys.map(k => col(k).as(s"__e_$k")) :+
        col(eventIdCol).as("__e_id") :+ col(eventTsCol).as("__e_ts")): _*)
    val cond = keys.map(k => e(s"__e_$k") === anchors(k))
      .reduce(_ && _) &&
      e("__e_ts") > anchors(anchorTsCol) &&
      e("__e_ts") <= anchors(anchorTsCol) +
        expr(s"INTERVAL $horizonSeconds SECONDS")
    val winner = anchors.join(e, cond, "inner")
      .groupBy(col(anchorIdCol))
      .agg(min(struct(col("__e_ts"), col("__e_id"))).as("__w"))
      .select(col(anchorIdCol),
        col("__w.__e_id").as("next_event_id"),
        col("__w.__e_ts").as("next_ts"))
    anchors.join(winner, Seq(anchorIdCol), "left")
  }

  def pointInInterval(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be > 0, got $bucketSeconds")
    // timestamp→long casts are epoch SECONDS (truncated); buckets only
    // gate candidacy, the residual predicate runs on raw timestamps, so
    // second-granularity bucketing is exact for sub-second data too
    val w = lit(bucketSeconds)
    val p = points.withColumn("__graft_pb",
      floor(col(tsCol).cast("long") / w))
    val iv = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__graft_ib", explode(sequence(
        floor(col(startCol).cast("long") / w),
        floor(col(endCol).cast("long") / w))))
    p.join(iv,
        col("__graft_pb") === col("__graft_ib") &&
          col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__graft_pb", "__graft_ib")
  }
}
