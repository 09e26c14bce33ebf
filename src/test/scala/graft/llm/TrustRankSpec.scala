package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TrustRank fixed-point semantics: hand-computed iterations, dangling
  * mass re-entering through the SEED distribution (the personalized-PR
  * convention), trust attenuation with distance from the seed set, and
  * bit-exact repartition invariance. */
class TrustRankSpec extends SparkSpec {
  import spark.implicits._

  test("two iterations match hand-computed integer arithmetic") {
    // chain A→B→C→D, seeds={A}, scale=1000, damp 85/100, s=1.
    // init: A=1000 others 0; base(A)=1000*15//100=150.
    // iter1: contribs A→B:1000; dangling D r=0.
    //   A=150, B=85*1000//100=850, C=0, D=0.
    // iter2: contribs A→B:150, B→C:850; dangling D r=0.
    //   A=150, B=85*150//100=127, C=85*850//100=722, D=0.
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D")).toDF("s", "d")
    val seeds = Seq("A").toDF("n")
    val got = Graph.trustRank(edges, "s", "d", seeds, "n",
        iters = 2, scale = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> 150L, "B" -> 127L, "C" -> 722L, "D" -> 0L))
  }

  test("dangling mass re-enters through the seeds, not uniformly") {
    // A→D with D dangling, seeds={A}, scale=1000.
    // iter1: A=150, D=850. iter2: dangling d=850 returns to A:
    //   A = 150 + 85*(0 + 850//1)//100 = 872; D = 85*150//100 = 127.
    val edges = Seq(("A", "D")).toDF("s", "d")
    val seeds = Seq("A").toDF("n")
    val got = Graph.trustRank(edges, "s", "d", seeds, "n",
        iters = 2, scale = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("A" -> 872L, "D" -> 127L))
    // contrast: plain PageRank would hand part of d to D as well
  }

  test("nodes beyond iters hops from any seed score zero") {
    val edges = Seq(("A", "B"), ("B", "C"), ("C", "D")).toDF("s", "d")
    val seeds = Seq("A").toDF("n")
    val got = Graph.trustRank(edges, "s", "d", seeds, "n",
        iters = 1, scale = 1000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("C") == 0L && got("D") == 0L)
    assert(got("B") > 0L)
  }

  test("bit-identical under repartitioning on real data") {
    val li = graft.Tables.read(spark, sf("sf0.001"), "lineitem")
    val fwd = li.select((col("l_partkey") * 2).as("s"),
      (col("l_suppkey") * 2 + 1).as("d"))
    val rev = li.select((col("l_suppkey") * 2 + 1).as("s"),
      (col("l_partkey") * 2).as("d"))
    val e = fwd.union(rev)
    val seeds = graft.Tables.read(spark, sf("sf0.001"), "supplier")
      .filter(col("s_nationkey") < 5)
      .select((col("s_suppkey") * 2 + 1).as("n"))
    val a = Graph.trustRank(e, "s", "d", seeds, "n", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.trustRank(e.repartition(17), "s", "d", seeds, "n",
        iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.max > 0L)
  }

  test("seeds absent from the graph are rejected") {
    val edges = Seq(("A", "B")).toDF("s", "d")
    val seeds = Seq("Z").toDF("n")
    intercept[IllegalArgumentException] {
      Graph.trustRank(edges, "s", "d", seeds, "n", iters = 1)
    }
  }
}
