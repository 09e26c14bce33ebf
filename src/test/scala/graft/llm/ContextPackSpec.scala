package graft.llm

import graft.SparkSpec

/** Semantic properties of the RAG context-packing stage (the oracle
  * gate proves engine-equivalence of the full rag_context_pack query;
  * these prove the prefix-cut rule itself on hand-built candidates). */
class ContextPackSpec extends SparkSpec {
  import spark.implicits._

  // docs whose BPE-ish token counts are easy to state: "a b c" → 3
  // letter-run tokens (whitespace is the only non-token char class)
  private def doc(id: Long, nTokens: Int): (Long, String) =
    (id, Seq.fill(nTokens)("tok").mkString(" "))

  private def pack(
      docs: Seq[(Long, String)], cands: Seq[(Long, Long, Int)],
      budget: Long) =
    Similarity.contextPack(
      docs.toDF("doc_id", "text"),
      cands.toDF("qid", "nid", "rank"),
      "doc_id", "text", budget)
      .select("qid", "nid", "rank", "n_tokens", "cum_tokens")
      .as[(Long, Long, Int, Long, Long)].collect().sortBy(_._3).toSeq

  test("prefix cut: keeps ranks while the running total fits, then stops") {
    val docs = Seq(doc(1, 5), doc(2, 3), doc(3, 4), doc(4, 2))
    val cands = Seq((9L, 1L, 1), (9L, 2L, 2), (9L, 3L, 3), (9L, 4L, 4))
    val out = pack(docs, cands, budget = 9)
    // ranks 1,2 fit (5, 5+3=8); rank 3 would reach 12 > 9 — PREFIX cut:
    // rank 4 (2 tokens, would fit after a skip) must NOT sneak in
    assert(out.map(r => (r._2, r._4, r._5)) ==
      Seq((1L, 5L, 5L), (2L, 3L, 8L)))
  }

  test("a rank-1 doc over budget empties the query's context") {
    val out = pack(Seq(doc(1, 50)), Seq((9L, 1L, 1)), budget = 10)
    assert(out.isEmpty)
  }

  test("queries pack independently; a shared doc is counted per query") {
    val docs = Seq(doc(1, 4), doc(2, 4))
    val cands = Seq((1L, 1L, 1), (1L, 2L, 2), (2L, 1L, 1))
    val out = pack(docs, cands, budget = 8)
    assert(out.filter(_._1 == 1L).map(_._2) == Seq(1L, 2L))
    assert(out.filter(_._1 == 2L).map(_._2) == Seq(1L))
  }

  test("exact-fit boundary is inclusive (cum == budget keeps the doc)") {
    val out = pack(Seq(doc(1, 5), doc(2, 5)),
      Seq((1L, 1L, 1), (1L, 2L, 2)), budget = 10)
    assert(out.map(_._5) == Seq(5L, 10L))
  }

  test("a candidate id absent from the docs table FAILS the job loudly") {
    // ADVICE r14: an inner join silently dropped the missing rank and
    // later ranks slid into the budget as if the gap never existed —
    // the strict prefix-cut contract requires failing instead
    val e = intercept[Exception] {
      pack(Seq(doc(1, 3)), Seq((9L, 1L, 1), (9L, 77L, 2)), budget = 100)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("absent from docs table: 77")))
  }
}
