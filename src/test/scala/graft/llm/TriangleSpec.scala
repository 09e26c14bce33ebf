package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Degree-orientation triangle counting: exact per-node counts on
  * hand-built graphs, invariance to direction/multi-edges/self-loops,
  * and the each-triangle-counted-once guarantee of the acyclic
  * orientation. */
class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangles(edges.toDF("s", "d"), "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 yields 4 triangles, 3 per node; squares and stars yield none") {
    // K4 on 1..4 + a square 5-6-7-8 (no diagonal) + a star hub 9
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a < b
    } yield (a, b)
    val square = Seq((5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L))
    val star = Seq((9L, 10L), (9L, 11L), (9L, 12L), (9L, 13L))
    val got = counts(k4 ++ square ++ star)
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("direction, duplicate edges and self-loops don't change counts") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val noisy = tri ++ tri.map { case (a, b) => (b, a) } ++
      Seq((1L, 2L), (2L, 2L), (3L, 3L))
    assert(counts(noisy) == counts(tri))
    assert(counts(tri) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a skewed hub still counts exactly: wheel graph") {
    // wheel: hub 0 joined to every rim node of a 6-cycle 1..6 — the
    // shape where a naive neighbor self-join on the hub explodes.
    // Triangles = 6 (one per rim edge); hub on all 6, each rim node
    // on the 2 triangles of its incident rim edges + 0 rim-only ones
    val rim = (1L to 6L).map(i => (i, if (i == 6L) 1L else i + 1))
    val spokes = (1L to 6L).map(i => (0L, i))
    val got = counts(rim ++ spokes)
    assert(got(0L) == 6L)
    assert((1L to 6L).forall(got(_) == 2L))
  }

  test("repartitioning never changes the result") {
    val edges = (for (a <- 1L to 12L; b <- 1L to 12L if a < b && (a + b) % 3 != 0)
      yield (a, b)).toDF("s", "d")
    val one = Graph.triangles(edges.repartition(1), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val many = Graph.triangles(edges.repartition(7), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == many && one.nonEmpty)
  }

  test("sum of per-node counts is exactly 3x the triangle total: K5") {
    val k5 = for (a <- 1L to 5L; b <- 1L to 5L if a < b) yield (a, b)
    val got = counts(k5)
    // K5: C(5,3) = 10 triangles; each node on C(4,2) = 6
    assert(got.values.sum == 30L && got.values.forall(_ == 6L))
  }
}
