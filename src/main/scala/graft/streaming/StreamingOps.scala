package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured-Streaming counterparts of the engine's batch semantics.
  * The reference is batch-only (SURVEY §2.9) — these are the extension a
  * streaming feature pipeline needs, built on the standard primitives:
  * `withWatermark` + windowed aggregation, `dropDuplicates` streaming
  * dedup, and `mapGroupsWithState` for latest-per-key state.
  *
  * Scale posture: state is keyed by entity (hash-partitioned by the
  * streaming engine); watermarks bound state size; no per-batch driver
  * work. Sinks are the caller's choice (`writeStream` on the returned
  * frame).
  */
object StreamingOps {

  /** A keyed event row — the streaming materialization unit (entity key,
    * event time, feature value). */
  final case class KeyedEvent(user_id: Long, ts: Timestamp, value: Double)

  /** Generic streaming pull-latest: one state row per key holding the
    * "newest" element under the caller's ordering — arbitrary key and row
    * types, mirroring batch [[graft.PullLatest]]'s generality. Emits the
    * updated latest row for every key touched by a micro-batch (update
    * mode). Feed the output to an online-store sink and each key
    * converges to its as-of-now feature values. */
  def latestPerKeyTyped[K, T](
      events: Dataset[T], key: T => K, ordering: Ordering[T])(
      implicit kEnc: org.apache.spark.sql.Encoder[K],
      tEnc: org.apache.spark.sql.Encoder[T]): Dataset[T] =
    events
      .groupByKey(key)
      .mapGroupsWithState[T, T](GroupStateTimeout.NoTimeout) {
        (_: K, batch: Iterator[T], state: GroupState[T]) =>
          val newest = (batch ++ state.getOption.iterator).max(ordering)
          state.update(newest)
          newest
      }

  /** Concrete convenience shape (entity key, event time, feature value)
    * with the batch tie-break ordering (ts, then value). */
  def latestPerKey(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    latestPerKeyTyped[Long, KeyedEvent](
      events, _.user_id, Ordering.by(e => (e.ts.getTime, e.value)))
  }

  /** Watermarked sliding/tumbling event-time aggregation: events per
    * (entity, window). Late data beyond the watermark is dropped by the
    * engine; state for closed windows is reclaimed. */
  def windowedCounts(
      events: DataFrame, tsCol: String, keyCol: String,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col(keyCol))
      .agg(count(lit(1)).as("n_events"), max(col(tsCol)).as("latest_ts"))

  /** Streaming exact dedup: first occurrence PER ID wins within the
    * watermark horizon (the streaming analogue of
    * [[graft.llm.Dedup.dropExactDuplicates]]).
    * `dropDuplicatesWithinWatermark` is the primitive that implements
    * exactly this contract with watermark-bounded state — a plain
    * `dropDuplicates(idCols :+ ts)` would only drop rows identical in
    * BOTH id and timestamp, letting re-ingested duplicates through. */
  def dedupStream(
      events: DataFrame, idCols: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** STREAMING point-in-time enrichment — the streaming counterpart of
    * the flagship batch as-of join ([[graft.PointInTime]]): each
    * streaming entity row is attached the latest STATIC feature row with
    * `featureTs <= entityTs` (and `>= entityTs - ttl` when ttl > 0),
    * NULL features when none qualifies — the same semantics the batch
    * oracle checks, per micro-batch.
    *
    * Shape: watermarked stream LEFT OUTER stream-static join (equi keys +
    * range residual — the static side is re-planned per micro-batch, no
    * state) followed by a watermark-bounded `max_by(struct(featureTs,
    * features), featureTs)` aggregate keyed by the full entity row.
    * `max_by` skips NULL ordering keys, so an entity row whose join found
    * nothing keeps one all-NULL feature struct — the left semantics
    * survive the aggregate. State = one row per in-flight entity row,
    * reclaimed at the watermark; append mode emits each enriched row
    * exactly once, when its event time expires.
    *
    * Identical duplicate entity rows collapse to one (the batch engine's
    * A1 distinct-entity semantics). */
  def enrichAsOf(
      entities: DataFrame,
      features: DataFrame,
      joinKeys: Seq[String],
      entityTsCol: String,
      featureTsCol: String,
      featureCols: Seq[String],
      ttlSeconds: Long = 0,
      watermark: String = "1 hour"): DataFrame = {
    require(joinKeys.nonEmpty, "enrichAsOf needs at least one join key")
    // feature VALUE columns keep their names through the join — a collision
    // with an entity column would make the post-join groupBy ambiguous
    val collisions = featureCols.toSet
      .intersect(entities.columns.toSet)
    require(collisions.isEmpty,
      s"feature columns collide with entity columns: " +
        s"${collisions.mkString(", ")} — rename one side")
    // the feature side is renamed to __f_* internally — an entity or
    // feature column already named that way would make keyCond/rangeCond
    // ambiguous or silently bind to the wrong side
    val reserved = (joinKeys.map("__f_" + _) :+ "__f_ts").toSet
    val reservedHits = reserved
      .intersect(entities.columns.toSet ++ featureCols)
    require(reservedHits.isEmpty,
      s"columns collide with enrichAsOf's internal names: " +
        s"${reservedHits.mkString(", ")} — rename them")
    val f = features.select(
      (joinKeys.map(c => col(c).as(s"__f_$c")) :+
        col(featureTsCol).as("__f_ts")) ++ featureCols.map(col): _*)
    val keyCond = joinKeys
      .map(c => col(c) === col(s"__f_$c"))
      .reduce(_ && _)
    val rangeCond =
      if (ttlSeconds > 0)
        col("__f_ts") <= col(entityTsCol) &&
          col("__f_ts") >= col(entityTsCol) - expr(s"INTERVAL $ttlSeconds SECONDS")
      else col("__f_ts") <= col(entityTsCol)

    val entityCols = entities.columns.toSeq
    val joined = entities
      .withWatermark(entityTsCol, watermark)
      .join(f, keyCond && rangeCond, "left_outer")
    joined
      .groupBy(entityCols.map(col): _*)
      .agg(max_by(
        struct(col("__f_ts") +: featureCols.map(col): _*),
        col("__f_ts")).as("__best"))
      .select(entityCols.map(col) ++
        featureCols.map(c => col(s"__best.$c").as(c)): _*)
  }
}
