package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IntervalJoinSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("bucketed join == naive range join on the sf0.001 event stream") {
    val e = Tables.read(spark, sf(), "events")
    val windows = e.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("window_id"), col("ts").as("ws"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("we"))
    val points = e.select("event_id", "ts")
    val got = IntervalJoin.pointInInterval(points, "ts", windows, "ws", "we")
      .select("event_id", "window_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(windows,
        col("ts") >= col("ws") && col("ts") < col("we"))
      .select("event_id", "window_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.nonEmpty)
  }

  test("boundary, multi-bucket, inverted and sub-second intervals") {
    import spark.implicits._
    val points = Seq(
      (1L, ts("2024-01-01 10:00:00")),       // == start: included
      (2L, ts("2024-01-01 11:00:00")),       // == end: excluded
      (3L, ts("2024-01-01 10:59:59.999999")),// just inside
      (4L, ts("2024-01-02 03:30:00")),       // deep inside the long window
      (5L, ts("2024-01-05 00:00:00")),       // outside everything
      (6L, ts("2024-01-01 10:00:00.000001")) // sub-second containment
    ).toDF("pid", "pts")
    val intervals = Seq(
      (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      // 30h window: spans ~30 hourly buckets — replication path
      (200L, ts("2024-01-01 22:00:00"), ts("2024-01-03 04:00:00")),
      // inverted and empty: must match nothing (and not crash sequence)
      (300L, ts("2024-01-02 00:00:00"), ts("2024-01-01 00:00:00")),
      (400L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:30:00"))
    ).toDF("wid", "ws", "we")
    val got = IntervalJoin.pointInInterval(points, "pts", intervals,
        "ws", "we")
      .select("pid", "wid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (3L, 100L), (6L, 100L), (4L, 200L)))
  }

  test("intervalOverlap == naive overlap join, each pair exactly once") {
    val e = Tables.read(spark, sf(), "events")
    val wa = e.filter(col("event_id") % 7 === 0)
      .select(col("event_id").as("window_a"), col("ts").as("was"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("wae"))
    val wb = e.filter(col("event_id") % 11 === 0)
      .select(col("event_id").as("window_b"), col("ts").as("wbs"),
        (col("ts") + expr("INTERVAL 2 HOUR")).as("wbe"))
    // MULTISET compare (not a set): a canonical-bucket bug that emits a
    // pair once per shared bucket must fail this, so count duplicates
    val got = IntervalJoin.intervalOverlap(wa, "was", "wae", wb, "wbs", "wbe")
      .select("window_a", "window_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    val naive = wa.join(wb, col("was") < col("wbe") && col("wbs") < col("wae"))
      .select("window_a", "window_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == naive && got.nonEmpty && got.values.forall(_ == 1))
  }

  test("overlap corners: touching endpoints, containment, multi-bucket") {
    import spark.implicits._
    val a = Seq(
      (1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")),
      (2L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00")), // 24h
      (3L, ts("2024-01-03 10:00:00"), ts("2024-01-03 10:00:00"))  // empty
    ).toDF("ida", "was", "wae")
    val b = Seq(
      (10L, ts("2024-01-01 11:00:00"), ts("2024-01-01 12:00:00")), // abuts 1: NO overlap (half-open)
      (11L, ts("2024-01-01 10:30:00"), ts("2024-01-01 10:45:00")), // inside 1 and 2
      (12L, ts("2024-01-01 23:59:59"), ts("2024-01-02 06:00:00")), // tail of 2
      (13L, ts("2024-01-03 09:00:00"), ts("2024-01-03 11:00:00"))  // would hit 3 were it non-empty
    ).toDF("idb", "wbs", "wbe")
    val got = IntervalJoin.intervalOverlap(a, "was", "wae", b, "wbs", "wbe")
      .select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L), (2L, 11L), (2L, 10L), (2L, 12L)))
  }

  test("the bucket condition is extracted as an equi join (no BNLJ)") {
    val e = Tables.read(spark, sf(), "events")
    val windows = e.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("window_id"), col("ts").as("ws"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("we"))
    val df = IntervalJoin.pointInInterval(
      e.select("event_id", "ts"), "ts", windows, "ws", "we")
    df.queryExecution.toRdd.count()
    def flat(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case other                    => other.children
      }
      p +: kids.flatMap(flat)
    }
    val nodes = flat(df.queryExecution.executedPlan).map(_.nodeName).toSet
    assert(!nodes.exists(n =>
      n.contains("BroadcastNestedLoopJoin") || n.contains("CartesianProduct")),
      s"plan nodes: $nodes")
  }

  test("firstAfterWithin: winner, horizon, tie-break and NULL corners") {
    import spark.implicits._
    val anchors = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),  // next at 10:10
      (2L, 10L, ts("2024-01-01 23:00:00")),  // nothing within 1h
      (3L, 20L, ts("2024-01-01 10:00:00")))  // tie on ts → min event id
      .toDF("anchor_id", "user_id", "ts")
    val events = Seq(
      (100L, 10L, ts("2024-01-01 10:10:00")),
      (101L, 10L, ts("2024-01-01 10:20:00")),
      (102L, 10L, ts("2024-01-02 08:00:00")),
      (103L, 20L, ts("2024-01-01 10:05:00")),
      (104L, 20L, ts("2024-01-01 10:05:00")),
      (105L, 30L, ts("2024-01-01 10:00:30")),  // other user — never
      (106L, 10L, ts("2024-01-01 10:00:00")))  // equal ts — strict >
      .toDF("event_id", "user_id", "ts")
    val got = IntervalJoin.firstAfterWithin(
        anchors, "anchor_id", "ts", events, "event_id", "ts",
        Seq("user_id"), 3600)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(got == Map(1L -> Some(100L), 2L -> None, 3L -> Some(103L)))
  }

  test("firstAfterWithin == naive window formulation on sf0.001 events") {
    val e = Tables.read(spark, sf(), "events")
    val anchors = e.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("anchor_id"), col("user_id"), col("ts"))
    val got = IntervalJoin.firstAfterWithin(
        anchors, "anchor_id", "ts",
        e.select("event_id", "user_id", "ts"), "event_id", "ts",
        Seq("user_id"), 86400)
      .select("anchor_id", "next_event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    val naive = anchors.as("a")
      .join(e.select(col("event_id").as("eid"), col("user_id").as("u"),
        col("ts").as("ets")),
        col("u") === col("a.user_id") && col("ets") > col("a.ts") &&
          col("ets") <= col("a.ts") + expr("INTERVAL 86400 SECONDS"), "left")
      .groupBy(col("anchor_id"))
      .agg(min(struct(col("ets"), col("eid"))).as("w"))
      .select(col("anchor_id"), coalesce(col("w.eid"), lit(-1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got.exists(_._2 >= 0))
  }
}
