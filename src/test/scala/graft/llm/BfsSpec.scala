package graft.llm

import graft.SparkSpec

/** Multi-source BFS hop distance: shortest-path depths on hand graphs,
  * direction respected, off-graph seeds dropped, unreached nodes absent,
  * and partitioning invariance. */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def depths(edges: Seq[(Long, Long)], seeds: Seq[Long],
      hops: Int = 4): Map[Long, Long] =
    Graph.bfsDepth(edges.toDF("s", "d"), "s", "d",
        seeds.toDF("n"), "n", maxHops = hops)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain: depth is the hop count; beyond maxHops absent") {
    val chain = (1L to 6L).map(i => (i, i + 1))
    val got = depths(chain, Seq(1L), hops = 3)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
  }

  test("shortest path wins when a longer route reaches the same node") {
    // 1→2→3→4 and the shortcut 1→4: depth(4) must be 1, not 3
    val got = depths(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)), Seq(1L))
    assert(got(4L) == 1L && got(3L) == 2L)
  }

  test("multi-source: each node takes the nearest seed; direction respected") {
    // 1→2→3 and 9→3; seeds {1, 9}: depth(3) = 1 via 9. 2→1 absent so
    // nothing reaches 1 backwards.
    val got = depths(Seq((1L, 2L), (2L, 3L), (9L, 3L)), Seq(1L, 9L))
    assert(got == Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 1L))
  }

  test("seeds not present in the graph are dropped; unreached nodes absent") {
    val got = depths(Seq((1L, 2L), (5L, 6L)), Seq(1L, 42L))
    assert(got == Map(1L -> 0L, 2L -> 1L)) // 5,6 unreached; 42 off-graph
  }

  test("cycles terminate and keep first-visit depth") {
    val got = depths(Seq((1L, 2L), (2L, 3L), (3L, 1L)), Seq(1L), hops = 6)
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("repartitioning never changes the result") {
    val edges = for (a <- 1L to 30L; b <- Seq((a * 7) % 30 + 1, (a * 3) % 30 + 1))
      yield (a, b)
    val base = depths(edges, Seq(1L, 2L))
    val got = Graph.bfsDepth(edges.toDF("s", "d").repartition(7), "s", "d",
        Seq(1L, 2L).toDF("n"), "n", maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == base)
  }
}
