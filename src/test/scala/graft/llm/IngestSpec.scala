package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental ingestion dedup: the asymmetric prefix-filtered pair join
  * must equal brute-force cross-side comparison, and the materializing
  * stage must drop exactly the exact-copies and near-copies of corpus
  * documents. */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "spark engines shuffle data between executors across the cluster"),
    (3L, "completely unrelated text about cooking pasta with fresh basil"))
    .toDF("doc_id", "text")

  private val incoming = Seq(
    (101L, "the quick brown fox jumps over the lazy dog again and again"),
    (102L, "spark engines shuffle data between executors across the whole cluster"),
    (103L, "a genuinely novel document mentioning nothing seen before today"))
    .toDF("doc_id", "text")

  test("cross-side pairs equal brute-force union-pair filtering") {
    val against = Dedup.jaccardPairsAgainst(incoming, corpus,
      "doc_id", "text", n = 3, tau = 0.5)
      .select("id_new", "id_corpus", "jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force: symmetric pairs over the union, keep cross pairs only
    val brute = Dedup.jaccardShinglePairs(incoming.union(corpus),
      "doc_id", "text", n = 3, tau = 0.5)
      .filter(col("id_a") < 100 && col("id_b") >= 100)
      .select(col("id_b"), col("id_a"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(against == brute)
    // and the exact copy + the one-word edit are both found
    assert(against.map(p => (p._1, p._2)) == Set((101L, 1L), (102L, 2L)))
    assert(against.exists(p => p._1 == 101L && p._3 == 1.0))
  }

  test("dropDuplicatesAgainst keeps exactly the novel incoming docs") {
    val kept = Dedup.dropDuplicatesAgainst(incoming, corpus,
      "doc_id", "text", n = 3, tau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(103L))
    // incoming-vs-incoming dups are out of scope here by contract:
    // ingesting the same novel doc twice keeps both
    val twice = incoming.union(Seq((104L,
      "a genuinely novel document mentioning nothing seen before today"))
      .toDF("doc_id", "text"))
    val kept2 = Dedup.dropDuplicatesAgainst(twice, corpus,
      "doc_id", "text", n = 3, tau = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 == Set(103L, 104L))
  }
}
