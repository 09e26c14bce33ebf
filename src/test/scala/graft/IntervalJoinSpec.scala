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
}
