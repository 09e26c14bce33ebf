package graft.llm

import graft.SparkSpec

/** Keep-first semantics of the corpus-level paragraph dedup
  * ([[Dedup.dropDuplicateParagraphs]]) on hand-built corpora — the
  * oracle gate proves engine-equivalence on the fixture corpus; these
  * pin the selection rule itself. Chunk size 2 keeps the paragraphs
  * analytic. */
class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)]) =
    Dedup.dropDuplicateParagraphs(
        docs.toDF("doc_id", "text"), "doc_id", "text", chunkTokens = 2)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a shared paragraph survives only in the smallest doc id; " +
    "unshared text is untouched") {
    val out = run(Seq(
      (1L, "a b c d"),        // chunks: "a b", "c d"
      (2L, "c d e f"),        // "c d" repeats doc 1 → dropped
      (3L, "g h")))           // untouched
    assert(out(1L) == (("a b c d", 2L, 0L)))
    assert(out(2L) == (("e f", 1L, 1L)))
    assert(out(3L) == (("g h", 1L, 0L)))
  }

  test("an exact duplicate document loses every paragraph but keeps " +
    "its (empty) row") {
    val out = run(Seq((1L, "a b c d"), (5L, "a b c d")))
    assert(out(1L) == (("a b c d", 2L, 0L)))
    assert(out(5L) == (("", 0L, 2L)))
  }

  test("a WITHIN-doc repeat keeps only the earliest position") {
    val out = run(Seq((1L, "x y z w x y")))
    // chunks: "x y"(0), "z w"(1), "x y"(2) — pos 2 drops
    assert(out(1L) == (("x y z w", 2L, 1L)))
  }

  test("keep-first is by (doc, pos), not arrival order: the smaller " +
    "doc id wins even when the larger doc has it at an earlier position") {
    val out = run(Seq(
      (1L, "a a b b"),   // "b b" at pos 1
      (2L, "b b c c")))  // "b b" at pos 0 — still loses to doc 1
    assert(out(1L) == (("a a b b", 2L, 0L)))
    assert(out(2L) == (("c c", 1L, 1L)))
  }

  test("a short final chunk is its own paragraph and dedups like any " +
    "other") {
    val out = run(Seq((1L, "a b c"), (2L, "c")))
    // doc 1 chunks: "a b", "c"; doc 2's lone "c" repeats it
    assert(out(1L) == (("a b c", 2L, 0L)))
    assert(out(2L) == (("", 0L, 1L)))
  }
}
