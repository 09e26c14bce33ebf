package graft.llm

import graft.SparkSpec

/** Occurrence semantics of the positional phrase search
  * ([[TextAnalysis.phraseSearch]]) on hand-built corpora; the oracle
  * gate proves engine-equivalence of the declared query. */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  private def search(docs: Seq[(Long, String)],
      phrases: Seq[(Long, String)], n: Int) =
    TextAnalysis.phraseSearch(
        docs.toDF("doc_id", "text"),
        phrases.toDF("qid", "phrase"), "doc_id", "text", n)
      .select("qid", "doc_id", "pos")
      .as[(Long, Long, Int)].collect().toSet

  test("every occurrence is reported with its 0-based token offset, " +
    "across documents") {
    val docs = Seq(
      (1L, "the quick fox jumps over the quick fox again"),
      (2L, "slow start then the quick fox ends"),
      (3L, "nothing here"))
    val out = search(docs, Seq((9L, "the quick fox")), n = 3)
    assert(out == Set((9L, 1L, 0), (9L, 1L, 5), (9L, 2L, 3)))
  }

  test("overlapping occurrences all match (positions slide by one)") {
    val out = search(Seq((1L, "a a a a a")), Seq((7L, "a a a")), n = 3)
    assert(out == Set((7L, 1L, 0), (7L, 1L, 1), (7L, 1L, 2)))
  }

  test("documents shorter than the phrase produce no postings; " +
    "normalization (case, whitespace) applies before matching") {
    val docs = Seq((1L, "ab"), (2L, "  The   QUICK fox  "))
    val out = search(docs, Seq((5L, "the quick fox")), n = 3)
    assert(out == Set((5L, 2L, 0)))
  }

  test("distinct phrases report under their own qid") {
    val docs = Seq((1L, "x y z w"))
    val out = search(docs, Seq((1L, "x y"), (2L, "z w")), n = 2)
    assert(out == Set((1L, 1L, 0), (2L, 1L, 2)))
  }
}
