package graft.llm

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.SparkSpec

/** Degenerate-input behavior of the sketch/graph/text operators — the
  * edges a long-running pipeline inevitably feeds them. Pinned here so a
  * refactor can't silently turn an empty input into a crash or a NaN. */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType))))

  test("HLL on empty input estimates 0 via linear counting") {
    val row = Sketches.hllDistinct(emptyDocs, "doc_id").head()
    assert(row.getAs[Long]("n_exact") == 0L)
    assert(row.getAs[Double]("est_hll") == 0.0)
    assert(row.getAs[String]("method") == "linear")
  }

  test("CMS on empty input returns no heavy hitters") {
    assert(Sketches.cmsTopK(emptyDocs, "doc_id", 5).count() == 0)
  }

  test("KMV with an absent label returns exact zeros for that side") {
    val d = Seq(("a", "k1"), ("a", "k2")).toDF("lab", "key")
    val row = Sketches.kmvSetOps(d, "key", "lab", "a", "b").head()
    assert(row.getAs[Long]("n_exact_a") == 2L)
    assert(row.getAs[Double]("est_a") == 2.0)
    assert(row.getAs[Long]("n_exact_b") == 0L)
    assert(row.getAs[Double]("est_b") == 0.0)
    assert(row.getAs[Long]("n_exact_inter") == 0L)
    assert(row.getAs[Double]("est_inter") == 0.0)
  }

  test("Bloom with an empty build side passes nothing") {
    val probe = Seq(1L, 2L, 3L).toDF("k")
    val row = Sketches.bloomSemiJoinStats(
      probe, "k", probe.filter(lit(false)), "k").head()
    assert(row.getAs[Long]("n_bloom_pass") == 0L)
    assert(row.getAs[Long]("n_exact") == 0L)
  }

  test("pageRank rejects an empty edge list instead of dividing by zero") {
    val e = emptyDocs.select(col("doc_id").as("s"), col("doc_id").as("d"))
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(e, "s", "d")
    }
    assert(ex.getMessage.contains("non-empty"))
  }

  test("quantile sketch and span scoring are empty-safe") {
    // grouped AND global: an empty population has no quantiles — zero
    // rows, not an INVALID_INDEX_OF_ZERO from the positional pick on the
    // grouping-less aggregate's one empty-sample row (regression: the
    // global path threw before the size(sv) > 0 guard)
    assert(Sketches.quantileSketchBy(
      emptyDocs.withColumn("g", lit("a")), Seq("g"), "doc_id",
      col("doc_id").cast("string"), Seq(0.5), 64).count() == 0)
    assert(Sketches.quantileSketchBy(
      emptyDocs, Nil, "doc_id",
      col("doc_id").cast("string"), Seq(0.5), 64).count() == 0)
    assert(Dedup.duplicatedSpans(
      emptyDocs, "doc_id", "text").count() == 0)
  }

  test("text operators are empty-safe") {
    assert(TextAnalysis.bm25(emptyDocs, "doc_id", "text",
      Seq("join"), k = 5).count() == 0)
    assert(TextAnalysis.qualityFilter(emptyDocs, "doc_id", "text")
      .count() == 0)
    assert(TextAnalysis.lmScore(emptyDocs, emptyDocs, "doc_id", "text")
      .count() == 0)
    assert(Dedup.dropDuplicatesAgainst(
      emptyDocs, emptyDocs, "doc_id", "text").count() == 0)
  }
}
