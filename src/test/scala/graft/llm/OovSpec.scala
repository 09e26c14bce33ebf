package graft.llm

import graft.SparkSpec

/** OOV-rate audit: vocab = top-V by (count DESC, term ASC) with a
  * deterministic tie-break, per-doc counts and the integer permille. */
class OovSpec extends SparkSpec {
  import spark.implicits._

  test("vocab boundary ties break by term; counts and permille exact") {
    // counts: aa=3, bb=3, cc=2, dd=2, ee=1 — V=3 keeps {aa, bb, cc}
    // (cc beats dd on the term tie-break at equal count 2)
    val docs = Seq(
      (1L, "aa bb aa cc"),
      (2L, "bb aa bb cc dd"),
      (3L, "dd ee")).toDF("id", "text")
    val got = TextAnalysis.oovRate(docs, "id", "text", vocabSize = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((4L, 0L, 0L)))
    assert(got(2L) == ((5L, 1L, 200L))) // dd is OOV: 1000*1 div 5
    assert(got(3L) == ((2L, 2L, 1000L))) // dd and ee both OOV
  }

  test("V >= distinct vocabulary means zero OOV everywhere") {
    val docs = Seq((1L, "x y"), (2L, "y z z")).toDF("id", "text")
    val got = TextAnalysis.oovRate(docs, "id", "text", vocabSize = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.forall(_ == 0L))
  }

  test("normalization: case and whitespace fold before counting") {
    val docs = Seq((1L, "  AA   aa\taA "), (2L, "zz")).toDF("id", "text")
    val got = TextAnalysis.oovRate(docs, "id", "text", vocabSize = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((3L, 0L))) // one vocab slot: 'aa' (count 3)
    assert(got(2L) == ((1L, 1L)))
  }
}
