package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Frontier-scheduling politeness invariants: per-host slots are
  * contiguous from 0 in (priority, url) order, fetch times step by
  * exactly the host's crawl delay, and hosts never interleave slots. */
class FrontierSpec extends SparkSpec {
  import spark.implicits._

  test("per-host slots are dense, ordered by priority, delay-spaced") {
    val frontier = Seq(
      ("https://x.example/a", 5L), ("https://x.example/b", 1L),
      ("https://x.example/c", 1L), ("https://y.example/a", 9L),
      ("https://y.example/b", 2L)).toDF("url", "prio")
    val delays = Seq(("x.example", 3L), ("y.example", 7L))
      .toDF("host", "delay_s")
    val got = Web.frontierSchedule(frontier, delays, "url", "prio")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3), r.getLong(4)))
    // x: b (prio 1) before c (prio 1, url tie-break) before a (prio 5)
    assert(got.toSet == Set(
      ("https://x.example/b", "x.example", 0L, 0L),
      ("https://x.example/c", "x.example", 1L, 3L),
      ("https://x.example/a", "x.example", 2L, 6L),
      ("https://y.example/b", "y.example", 0L, 0L),
      ("https://y.example/a", "y.example", 1L, 7L)))
  }

  test("the corpus schedule never violates a host's crawl delay") {
    val d = graft.Tables.read(spark, sf("sf0.001"), "documents")
    val u = d.select(Web.canonicalizeUrl(Web.syntheticUrl(col("doc_id")))
        .as("url")).distinct()
      .withColumn("prio", pmod(TextOps.hash32(col("url")), lit(1000L)))
    val delays = Web.syntheticDelays(
      u.select(Web.hostOf(col("url")).as("host")).distinct(), "host")
    val sched = Web.frontierSchedule(u, delays, "url", "prio")
      .join(delays, Seq("host"))
    // successive fetches within a host are >= delay apart, slots dense
    val bad = sched.groupBy("host")
      .agg(count(lit(1)).as("n"), max("slot").as("mx"),
        min("fetch_at_s").as("f0"), max("fetch_at_s").as("f1"),
        first("delay_s").as("ds"))
      .filter(col("mx") =!= col("n") - 1 || col("f0") =!= 0L ||
        col("f1") =!= col("mx") * col("ds"))
      .count()
    assert(bad == 0L)
  }
}
