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

  test("containment finds every chunk inside its parent at 1.0") {
    val d = graft.Tables.read(spark, sf("sf0.001"), "documents")
      .select("doc_id", "text")
    val chunks = TextAnalysis.chunkDocuments(d, "doc_id", "text", 16)
      .select((col("doc_id") * 1000 + col("chunk_idx")).as("doc_id"),
        col("chunk_text").as("text"))
    val pairs = Dedup.containmentPairs(chunks, d, "doc_id", "text",
      n = 3, c = 0.9)
      .select("id_needle", "id_hay", "containment").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // recall guarantee: a chunk IS a contiguous slice of its parent, so
    // every ≥3-word chunk must be reported against the parent with
    // containment exactly 1.0
    val expected = chunks
      .filter(size(split(col("text"), " ")) >= 3)
      .select("doc_id").collect().map(_.getLong(0))
    assert(expected.nonEmpty)
    expected.foreach { cid =>
      val parent = cid / 1000
      assert(pairs.get((cid, parent)).contains(1.0),
        s"chunk $cid not found in parent $parent")
    }
    // and Jaccard at tau=0.5 misses the asymmetric case: a 16-token
    // chunk vs its much larger parent — the reason containment exists
    val j = Dedup.jaccardShinglePairs(chunks.union(d), "doc_id", "text",
      n = 3, tau = 0.5)
      .filter(col("id_b") < 1000 && col("id_a") >= 1000)
      .count()
    assert(j < expected.length,
      "Jaccard should miss most chunk-in-parent pairs")
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
