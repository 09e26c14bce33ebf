package graft

import org.apache.spark.sql.functions._

/** Salting must be invisible in results: salted formulations equal their
  * plain equivalents on skewed data. */
class SkewSpec extends SparkSpec {

  // heavily skewed: 90% of rows share one key
  private def skewed = {
    import spark.implicits._
    (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i.toDouble))
      .toDF("k", "v").repartition(8)
  }

  test("saltedAggregate equals plain aggregation on skewed keys") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val salted = Skew.saltedAggregate(skewed, Seq("k"), 16,
      partials = Seq(count(lit(1)).as("n"), sum("v").as("s")),
      finals = Seq(sum("n").as("n"), sum("s").as("s")))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet == plain.keySet)
    salted.foreach { case (k, (n, s)) =>
      assert(n == plain(k)._1, s"count mismatch for $k")
      assert(math.abs(s - plain(k)._2) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("saltedJoin equals plain join, including unmatched left rows") {
    import spark.implicits._
    val dim = Seq((7L, "hot"), (20L, "cold")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k"), "left")
      .groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", 8, "left")
      .groupBy("label").agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("TopKAgg merge is partitioning-independent") {
    import spark.implicits._
    val data = (1 to 500).map(i => (1L, (i * 37 % 101).toDouble, i.toLong))
    for (parts <- Seq(1, 4, 13)) {
      val df = data.toDF("qid", "sim", "nid").repartition(parts)
      val topk = udaf(new graft.functions.TopKAgg(5))
      val got = df.groupBy("qid").agg(topk(col("sim"), col("nid")).as("t"))
        .select(explode(col("t"))).select("col.score", "col.id")
        .collect().map(r => (r.getDouble(0), r.getLong(1))).toList
      val expected = data.map(t => (t._2, t._3))
        .sortBy(t => (-t._1, t._2)).take(5).toList
      assert(got == expected, s"parts=$parts")
    }
  }
}
