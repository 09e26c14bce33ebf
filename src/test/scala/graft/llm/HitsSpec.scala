package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HITS fixed-point semantics: hand-computed one-iteration scores,
  * bit-exact repartition invariance, and the hub/authority asymmetry
  * the two-sided score exists for. */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  test("one iteration matches hand-computed integer arithmetic") {
    // h1→a1, h1→a2, h2→a1; n=4, scale=400 → h0=100 each.
    // araw: a1=200, a2=100; asum=300 → a(a1)=80000//300=266,
    // a(a2)=40000//300=133, a(h*)=0.
    // hraw: h1=266+133=399, h2=266; hsum=665 → h(h1)=159600//665=240,
    // h(h2)=106400//665=160, h(a*)=0.
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h2", "a1")).toDF("s", "d")
    val got = Graph.hits(edges, "s", "d", iters = 1, scale = 400L)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      "h1" -> ((0L, 240L)), "h2" -> ((0L, 160L)),
      "a1" -> ((266L, 0L)), "a2" -> ((133L, 0L))))
  }

  test("scores are bit-identical under repartitioning; sides separate") {
    val li = graft.Tables.read(spark, sf("sf0.001"), "lineitem")
    val e = li.select((col("l_partkey") * 2).as("s"),
      (col("l_suppkey") * 2 + 1).as("d"))
    val a = Graph.hits(e, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val b = Graph.hits(e.repartition(17), "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(a == b)
    // pure-source nodes (parts, even ids) carry zero authority; pure-
    // sink nodes (suppliers, odd ids) carry zero hub mass — and each
    // side's own score is non-degenerate
    val (parts, supps) = a.partition(_._1 % 2 == 0)
    assert(parts.values.forall(_._1 == 0L))
    assert(supps.values.forall(_._2 == 0L))
    assert(parts.values.map(_._2).max > 0L)
    assert(supps.values.map(_._1).max > 0L)
  }
}
