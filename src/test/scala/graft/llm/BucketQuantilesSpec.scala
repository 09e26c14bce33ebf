package graft.llm

import graft.SparkSpec

/** Per-group quantile bucketing: exact tercile cutoffs on a known
  * distribution, degenerate (constant) groups land entirely in bucket 1,
  * and the assignment is independent of the internal bin width (the bin
  * is a parallelism lever, never a semantic one). */
class BucketQuantilesSpec extends SparkSpec {
  import spark.implicits._

  test("known distribution cuts into exact equal-count terciles") {
    val df = (1L to 9L).map(v => ("g", v)).toDF("grp", "score")
    val got = Sampling.bucketByGroupQuantiles(df, "grp", "score", 3, 2L)
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    // cutoffs at ranks ceil(3)=3 → value 3 and ceil(6)=6 → value 6
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 2,
      6L -> 2, 7L -> 3, 8L -> 3, 9L -> 3))
  }

  test("a constant group lands entirely in bucket 1") {
    val df = (1 to 10).map(_ => ("g", 42L)).toDF("grp", "score")
    val buckets = Sampling.bucketByGroupQuantiles(df, "grp", "score", 3, 5L)
      .collect().map(_.getInt(2)).toSet
    assert(buckets == Set(1))
  }

  test("bucket assignment is independent of bin width and partitioning") {
    val d = graft.Tables.read(spark, sf("sf0.001"), "documents")
      .select($"doc_id", $"lang", ($"n_chars" % 977L).as("score"))
    def run(bw: Long, parts: Int) =
      Sampling.bucketByGroupQuantiles(d.repartition(parts), "lang",
          "score", 4, bw)
        .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    val a = run(1L, 4)
    assert(a == run(100L, 4) && a == run(7L, 13) && a.nonEmpty)
    // per (lang, bucket) counts differ by at most... each bucket holds
    // between floor(n/4) - ties and ceil(n/4) + ties; sanity: every
    // bucket 1..4 is populated for the biggest language
    val d2 = Sampling.bucketByGroupQuantiles(d, "lang", "score", 4, 10L)
    val top = d2.groupBy("lang").count()
      .orderBy(org.apache.spark.sql.functions.col("count").desc)
      .first().getString(0)
    val bks = d2.filter($"lang" === top)
      .select("bucket").distinct().collect().map(_.getInt(0)).toSet
    assert(bks == Set(1, 2, 3, 4))
  }
}
