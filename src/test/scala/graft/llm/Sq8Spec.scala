package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQ8 scalar-quantized ANN: 8-bit affine codes must preserve ranking
  * almost exactly (the quantization grid is ~0.4% of each dimension's
  * range), and the decode must round-trip the quantizer's own grid
  * points bit-exactly. */
class Sq8Spec extends SparkSpec {

  test("sq8 recall@5 vs the exact baseline is ~1 on real embeddings") {
    val e = graft.Tables.read(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    val approx = Similarity.sq8Knn(e, q, "vec_id", "embedding", k = 5)
    val exact = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 5)
    val r = Similarity.knnRecall(approx, exact)
      .agg(avg("recall")).collect()(0).getDouble(0)
    assert(r >= 0.9, s"sq8 recall@5 = $r")
  }

  test("grid points decode to themselves: sq8 == brute on grid-valued data") {
    import spark.implicits._
    // vectors whose components already lie on the quantizer's grid
    // (min = 0, max = 255 → scale = 1, codes = the values themselves):
    // quantization is lossless, so ranking must EQUAL the exact baseline
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(d => ((i * 31 + d * 17) % 256).toFloat))
    }
    // plant the full range so min/max are 0/255 in every dimension
    // (alternating, so neither planted vector is zero-norm)
    val planted = rows :+
      (200L, Array.tabulate(8)(d => if (d % 2 == 0) 0f else 255f)) :+
      (201L, Array.tabulate(8)(d => if (d % 2 == 0) 255f else 0f))
    val e = planted.toDF("vec_id", "embedding")
    val q = e.filter(col("vec_id") % 20 === 0)
    val sq = Similarity.sq8Knn(e, q, "vec_id", "embedding", k = 3, dim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val br = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(sq == br && sq.nonEmpty)
  }
}
