package graft.functions

import org.apache.spark.sql.GraftSql
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity

/** The all-integer MMR greedy selection (VERDICT r13 #1 — gated this
  * round): hand-replayable selections, λ edge cases, tie-breaking,
  * k > candidates, input-order invariance (the ADVICE r13 put-key
  * normalization), and the broken-contract throw (the ADVICE r13 boxed
  * null check — a missing pair must fail loudly, never read as sim 0).
  * Engine-equivalence of the full rag_mmr_rerank pipeline is proved by
  * its unrolled-CTE DuckDB oracle; these prove the selection rule. */
class MmrSelectSpec extends SparkSpec {
  import spark.implicits._

  /** Runs MmrSelect over ONE row's (candidates, pairs) and returns the
    * selected (nid, sel_rank, mmr_scaled) rows in selection order. */
  private def run(
      cands: Seq[(Long, Long)], pairs: Seq[(Long, Long, Long)],
      k: Int, lamNum: Int = 7, lamDen: Int = 10): Seq[(Long, Int, Long)] = {
    val df = Seq((cands, pairs)).toDF("c", "p")
    val sel = GraftSql.column(MmrSelect(
      GraftSql.expression(col("c")), GraftSql.expression(col("p")),
      k, lamNum, lamDen))
    df.select(explode(sel).as("m"))
      .select(col("m.nid"), col("m.sel_rank"), col("m.mmr_scaled"))
      .as[(Long, Int, Long)].collect().toSeq
  }

  test("diversification beats pure relevance: a near-dup of the first " +
    "pick loses step 2 to a lower-relevance distinct candidate") {
    // nid 1 (rel 1.0) and nid 2 (rel 0.6) are near-identical (sim 1.0);
    // nid 3 (rel 0.5) is orthogonal. Pure relevance orders 1,2,3; MMR at
    // λ=0.7 orders 1,3,2: step2 scores 2 at 7·6e5−3·1e6 = 1.2e6 < 3's
    // 7·5e5 = 3.5e6.
    val out = run(
      cands = Seq((1L, 1000000L), (2L, 600000L), (3L, 500000L)),
      pairs = Seq((1L, 2L, 1000000L), (1L, 3L, 0L), (2L, 3L, 0L)),
      k = 3)
    assert(out.map(_._1) == Seq(1L, 3L, 2L))
    // scores AT SELECTION TIME: step1 = λnum·rel, later = λnum·rel −
    // (λden−λnum)·maxSim over the selected set
    assert(out.map(_._3) == Seq(7000000L, 3500000L, 1200000L))
    assert(out.map(_._2) == Seq(1, 2, 3))
  }

  test("λ = 1 (no penalty) degenerates to pure relevance order") {
    val out = run(
      cands = Seq((1L, 1000000L), (2L, 600000L), (3L, 500000L)),
      pairs = Seq((1L, 2L, 1000000L), (1L, 3L, 0L), (2L, 3L, 0L)),
      k = 3, lamNum = 10, lamDen = 10)
    assert(out.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("equal scores tie to the smaller nid at every step") {
    // identical rels, identical (zero) pair sims — selection must be
    // pure nid order
    val out = run(
      cands = Seq((9L, 700000L), (4L, 700000L), (6L, 700000L)),
      pairs = Seq((4L, 6L, 0L), (4L, 9L, 0L), (6L, 9L, 0L)),
      k = 3)
    assert(out.map(_._1) == Seq(4L, 6L, 9L))
  }

  test("k > candidate count returns exactly the candidates") {
    val out = run(
      cands = Seq((1L, 300000L), (2L, 200000L)),
      pairs = Seq((1L, 2L, 100000L)),
      k = 10)
    assert(out.map(_._1) == Seq(1L, 2L))
    assert(out.map(_._2) == Seq(1, 2))
  }

  test("selection is invariant to candidate array order (put-side pair " +
    "key normalization — ADVICE r13)") {
    val sorted = Seq((1L, 1000000L), (2L, 600000L), (3L, 500000L))
    val shuffled = Seq((3L, 500000L), (1L, 1000000L), (2L, 600000L))
    val pairs = Seq((1L, 2L, 1000000L), (1L, 3L, 0L), (2L, 3L, 0L))
    assert(run(shuffled, pairs, k = 3) == run(sorted, pairs, k = 3))
  }

  test("a missing candidate pair throws the broken-contract error " +
    "(boxed lookup — ADVICE r13), never reads as sim 0") {
    // pair (2,3) omitted: step 2 scores candidate 3 against selected 1
    // fine, but after selecting, step 3 (or step 2 for candidate 2 vs 1)
    // is present — omit (1,3) instead so step 2 must look it up
    val e = intercept[Exception] {
      run(
        cands = Seq((1L, 1000000L), (2L, 600000L), (3L, 500000L)),
        pairs = Seq((1L, 2L, 1000000L), (2L, 3L, 0L)),
        k = 2)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("missing pair sim")),
      s"expected the broken-contract message, got: ${messages(e)}")
  }

  test("mmrRerank end-to-end: rank-1 is the relevance top-1; a " +
    "single-candidate query survives the empty-pairs path") {
    // 4 corpus vectors + the query vector itself (id 0, excluded from
    // its own candidates); vectors chosen so ids 1 and 2 are near-dups
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.9f, 0.1f, 0f, 0f)),
      (2L, Array(0.9f, 0.11f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0f, 1f, 0f))
    ).toDF("vec_id", "embedding")
    // λ = 0.3: diversity-heavy, so the near-dup (sim ≈ 1.0 to the first
    // pick) falls to the back while the orthogonal vectors move up
    val out = Similarity.mmrRerank(vecs,
        vecs.filter(col("vec_id") === 0L), "vec_id", "embedding",
        kCand = 4, k = 3, lamNum = 3, lamDen = 10)
      .orderBy("sel_rank")
      .select("nid", "sel_rank").as[(Long, Int)].collect().toSeq
    assert(out.map(_._2) == Seq(1, 2, 3))
    assert(out.head._1 == 1L) // highest cosine vs the query
    // then the two orthogonals; the near-dup of pick 1 is excluded
    assert(out.map(_._1) == Seq(1L, 4L, 3L))

    // 1-candidate corpus: pairs relation is empty for the query — the
    // typed-empty-array coalesce path; output is the single candidate
    val tiny = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.5f, 0.5f, 0f, 0f))).toDF("vec_id", "embedding")
    val one = Similarity.mmrRerank(tiny,
        tiny.filter(col("vec_id") === 0L), "vec_id", "embedding",
        kCand = 4, k = 3)
      .select("nid", "sel_rank").as[(Long, Int)].collect().toSeq
    assert(one == Seq((1L, 1)))
  }
}
