package graft.llm

import graft.SparkSpec

/** Selection semantics of DSIR importance resampling
  * ([[Sampling.dsirSelect]]): domain fit wins, length does not, and
  * scores are partitioning-invariant. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: 'alpha beta gamma' (the target domain)
  // vs 'delta epsilon zeta'
  private def aDoc(n: Int) =
    Seq.fill(n)(Seq("alpha", "beta", "gamma")).flatten.mkString(" ")
  private def bDoc(n: Int) =
    Seq.fill(n)(Seq("delta", "epsilon", "zeta")).flatten.mkString(" ")

  test("docs from the target's vocabulary outrank off-domain docs; " +
    "length cannot masquerade as fit") {
    val raw = Seq(
      (1L, aDoc(2)), (2L, aDoc(3)), (3L, aDoc(1)),
      (4L, bDoc(1)), (5L, bDoc(40)), // the LONG off-domain doc
      (6L, bDoc(2))).toDF("doc_id", "text")
    val target = Seq((100L, aDoc(5))).toDF("doc_id", "text")
    val picked = Sampling
      .dsirSelect(raw, target, "doc_id", "text", nFeatures = 64, k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == Set(1L, 2L, 3L),
      s"expected the on-domain docs, got $picked")
  }

  test("equal scores break by smaller doc id at the k boundary") {
    // four identical docs, k = 2 → ids 1 and 2
    val raw = (1L to 4L).map(i => (i, aDoc(2))).toDF("doc_id", "text")
    val target = Seq((9L, aDoc(3))).toDF("doc_id", "text")
    val picked = Sampling
      .dsirSelect(raw, target, "doc_id", "text", nFeatures = 64, k = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(picked == Set(1L, 2L))
  }

  test("scores are identical under repartitioning") {
    val raw = (1L to 40L)
      .map(i => (i, if (i % 3 == 0) aDoc((i % 5).toInt + 1)
                    else bDoc((i % 7).toInt + 1)))
      .toDF("doc_id", "text")
    val target = Seq((100L, aDoc(4))).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) = Sampling
      .dsirSelect(df, target, "doc_id", "text", nFeatures = 64, k = 10)
      .as[(Long, Double, Long)].collect().sortBy(_._1).toSeq
    assert(run(raw) == run(raw.repartition(13)))
  }
}
