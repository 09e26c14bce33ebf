package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Champion-list sparse retrieval: with championC >= corpus size it must
  * reduce EXACTLY to the full-postings operator, and every (qid, nid)
  * it returns must carry the identical exact sim the full operator
  * computes (truncation may cost recall, never score error). */
class ChampionSpec extends SparkSpec {

  private val docs = graft.Tables.read(spark, sf(), "documents")
  private val pred = col("doc_id") % 50 === 0

  test("championC >= |corpus| reduces exactly to the full operator") {
    val full = Similarity.sparseTfidfKnn(docs, "doc_id", "text", pred, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    val champ = Similarity.sparseTfidfChampionKnn(docs, "doc_id", "text",
        pred, 5, championC = 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(champ == full && full.nonEmpty)
  }

  test("returned sims are exact: every champion (qid, nid) matches the " +
    "full operator's sim for that pair") {
    val champ = Similarity.sparseTfidfChampionKnn(docs, "doc_id", "text",
      pred, 5, championC = 2)
    // rebuild the full scored relation at a k large enough to contain
    // any champion candidate
    val full = Similarity.sparseTfidfKnn(docs, "doc_id", "text", pred, 1000)
    val mismatches = champ.select(col("qid"), col("nid"),
        col("sim").as("cs"))
      .join(full.select(col("qid"), col("nid"), col("sim").as("fs")),
        Seq("qid", "nid"), "left")
      .filter(col("fs").isNull || col("fs") =!= col("cs"))
      .count()
    assert(mismatches == 0)
    assert(champ.count() > 0, "championC=2 must still retrieve something")
  }
}
