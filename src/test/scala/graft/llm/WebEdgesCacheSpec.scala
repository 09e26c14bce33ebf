package graft.llm

import graft.{SparkEntry, SparkSpec}
import graft.queries.LlmQueries

/** The web-graph family must share ONE corpus extraction scan
  * (VERDICT r13 #6): `web_link_graph` and `web_host_rank` both consume
  * the session-cached [[LlmQueries.webEdges]] relation, so after either
  * builds it, the other's plan reads the in-memory edge relation — not
  * the documents parquet — and both return the same object from the
  * cache (same (session, fingerprint) key). */
class WebEdgesCacheSpec extends SparkSpec {

  test("one extraction scan serves web_link_graph and web_host_rank") {
    val dir = sf()
    // identity: both consumers resolve to the SAME cached frame
    val e1 = LlmQueries.webEdges(spark, dir)
    val e2 = LlmQueries.webEdges(spark, dir)
    assert(e1 eq e2, "same data must return the cached edge relation")

    // after the build, a consumer's plan reads the in-memory edge
    // relation and has NO parquet relation of its own (node-level
    // check — the InMemoryRelation's stringified cached child still
    // mentions the original scan, so a string match would lie)
    val nodes = SparkEntry.queries("web_link_graph")(spark, dir)
      .queryExecution.optimizedPlan.collect { case n => n }
    assert(nodes.exists(_.getClass.getSimpleName == "InMemoryRelation"),
      "web_link_graph must read the cached edge relation")
    assert(!nodes.exists(_.getClass.getSimpleName == "LogicalRelation"),
      "web_link_graph must not rescan the page corpus once the shared " +
        "edge relation exists")

    // and the graph consumers agree with a direct (uncached) count of
    // resolvable outlinks — the cache must not change semantics
    val viaCache = SparkEntry.queries("web_link_graph")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("n_links")).collect()
      .head.getLong(0)
    assert(viaCache == e1.count())
  }
}
