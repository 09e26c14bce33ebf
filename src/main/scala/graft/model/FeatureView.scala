package graft.model

import graft.sources.FeatureSource

/** A named set of features over one source, with entity join keys and a TTL
  * lookback (ref: feast FeatureView as used by the plugin — e.g.
  * tests/feast_tests_funcs.py:223-251).
  *
  * @param entities join-key column names; empty ⇒ entity-less view (the
  *   reference joins these on a dummy-entity literal, hive.py:16,178,543-545
  *   — we simply as-of join on the timestamp alone, same semantics)
  * @param features feature column names; empty ⇒ every column that is not a
  *   join key or timestamp
  * @param ttlSeconds lookback bound: feature rows must satisfy
  *   `event_ts >= entity_ts - ttl`; 0 ⇒ unbounded (NOT zero-width —
  *   ref: hive.py:614-624, tests/feast_tests_funcs.py:263-269)
  * @param tieBreakColumns extra deterministic ordering columns applied after
  *   (event_ts DESC, created_ts DESC) when picking the latest row. The
  *   reference keeps exact ties (and can duplicate rows, hive.py:685-696);
  *   we pick one row deterministically when a tie-break is given.
  */
final case class FeatureView(
    name: String,
    entities: Seq[String],
    source: FeatureSource,
    features: Seq[String] = Nil,
    ttlSeconds: Long = 0L,
    tieBreakColumns: Seq[String] = Nil)

object FeatureView {
  /** ref: feast_hive/hive.py:16 — constant join key for entity-less views. */
  val DummyEntityId = "dummy_entity_id"
  val DummyEntityVal = ""
}
