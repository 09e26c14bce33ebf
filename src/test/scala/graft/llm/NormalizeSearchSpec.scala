package graft.llm

import java.text.Normalizer

import graft.SparkSpec

/** NFC normalization semantics (composition, fast-path identity,
  * idempotence vs the JDK reference) and conjunctive boolean search
  * (AND semantics, within-doc duplicate immunity, empty conjunction). */
class NormalizeSearchSpec extends SparkSpec {
  import spark.implicits._

  // "Cafe"+COMBINING ACUTE, ANGSTROM SIGN, "A"+COMBINING RING — 10 code
  // points raw; NFC composes to "Café Å Å" (8 points)
  private val Decomposed = "Cafe\u0301 \u212B A\u030A"

  test("nfcNormalize composes decomposed sequences and flags them") {
    val rows = Seq(
      (1L, Decomposed),
      (2L, "plain ascii text")).toDF("id", "t")
    val got = TextAnalysis.nfcNormalize(rows, "id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))).toMap
    val nfc1 = Normalizer.normalize(Decomposed, Normalizer.Form.NFC)
    assert(got(1L)._1 == 10)                   // raw code points
    assert(got(1L)._2 == nfc1.codePointCount(0, nfc1.length))
    assert(got(1L)._2 == 8)                    // composed code points
    assert(got(1L)._3 == 1)                    // changed
    assert(got(2L) == ((16, 16, 0, got(2L)._4))) // ASCII identity path
  }

  test("nfcNormalize is idempotent") {
    val a = TextAnalysis.nfcNormalize(
      Seq((1L, Decomposed)).toDF("id", "t"), "id", "t").collect()(0)
    // feed the composed form back through: no change the second time
    val composed = Normalizer.normalize(Decomposed, Normalizer.Form.NFC)
    val b = TextAnalysis.nfcNormalize(
      Seq((1L, composed)).toDF("id", "t"), "id", "t").collect()(0)
    assert(b.getInt(3) == 0)
    assert(a.getString(4) == b.getString(4)) // same md5 either way
  }

  test("boolSearch: AND semantics, duplicate-term immunity, empty result") {
    val corpus = Seq(
      (1L, "a b c"), (2L, "a c"), (3L, "b b a")).toDF("id", "t")
    val q = Seq(
      ("q1", "a"), ("q1", "b"),  // both terms → docs 1, 3
      ("q2", "c"),               // single term → docs 1, 2
      ("q3", "a"), ("q3", "zz")  // zz absent → no docs
    ).toDF("qid", "term")
    val got = TextAnalysis.boolSearch(corpus, q, "id", "t")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("q1", 1L), ("q1", 3L), ("q2", 1L), ("q2", 2L)))
  }

  test("boolSearch: duplicate query rows don't inflate the needed count") {
    val corpus = Seq((1L, "x y")).toDF("id", "t")
    val q = Seq(("q", "x"), ("q", "x"), ("q", "y")).toDF("qid", "term")
    val got = TextAnalysis.boolSearch(corpus, q, "id", "t").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("q", 1L)))
  }
}
