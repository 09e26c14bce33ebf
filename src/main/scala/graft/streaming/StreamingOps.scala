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

  /** Streaming pull-latest: one state row per key holding the newest
    * event (event-ts, then value as the deterministic tie-break — the
    * same ordering as the batch [[graft.PullLatest]]). Emits the updated
    * latest row for every key touched by a micro-batch (update mode).
    *
    * This is the streaming materialize path: feed the output to an
    * online-store sink and each key converges to its as-of-now feature
    * values. */
  def latestPerKey(events: Dataset[KeyedEvent]): Dataset[KeyedEvent] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[KeyedEvent, KeyedEvent](GroupStateTimeout.NoTimeout) {
        (key: Long, batch: Iterator[KeyedEvent], state: GroupState[KeyedEvent]) =>
          val candidates = batch ++ state.getOption.iterator
          val newest = candidates.maxBy(e => (e.ts.getTime, e.value))
          state.update(newest)
          newest
      }
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

  /** Streaming exact dedup: first occurrence per id wins within the
    * watermark horizon (the streaming analogue of
    * [[graft.llm.Dedup.dropExactDuplicates]] — state bounded by the
    * watermark instead of unbounded). */
  def dedupStream(
      events: DataFrame, idCols: Seq[String], tsCol: String,
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(idCols :+ tsCol)
}
