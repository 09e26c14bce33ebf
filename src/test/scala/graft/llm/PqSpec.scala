package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product-quantization ANN: deterministic codebook training, bounded
  * codes, and the ADC scoring pipeline proven bit-identical to a naive
  * single-threaded reimplementation built from the same codebooks. */
class PqSpec extends SparkSpec {

  private val M = 8
  private val Ksub = 16
  private val Dim = 64

  test("codebooks are partition-invariant (fixed-point training)") {
    val e = graft.Tables.read(spark, sf(), "embeddings")
    val a = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
      m = M, ksub = Ksub, iters = 2, dim = Dim)
    val b = Similarity.trainPqCodebooks(e.repartition(7), "vec_id",
      "embedding", m = M, ksub = Ksub, iters = 2, dim = Dim)
    assert(a == b)
    assert(a.length == M && a.forall(_.length == Ksub) &&
      a.forall(_.forall(_.length == Dim / M)))
  }

  test("identical vectors encode to identical codes, codes are bounded") {
    val e = graft.Tables.read(spark, sf(), "embeddings")
      .select("vec_id", "embedding")
    val books = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
      m = M, ksub = Ksub, iters = 2, dim = Dim)
    // duplicate every row under a shifted id: the code column must be a
    // pure function of the vector
    val dup = e.select(col("vec_id") + 1000000L, col("embedding"))
      .toDF("vec_id", "embedding")
    val codes = Similarity.pqEncodeCorpus(
        e.unionByName(dup), "vec_id", "embedding", books)
      .select(col("id") % 1000000L, col("codes"))
      .toDF("k", "codes")
    assert(codes.groupBy("k").agg(countDistinct("codes").as("n"))
      .filter(col("n") =!= 1).count() == 0)
    val bad = codes.select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= Ksub).count()
    assert(bad == 0)
  }

  test("null elements poison to null; short vectors fail loudly") {
    import org.apache.spark.sql.GraftSql
    import spark.implicits._
    // 2 subspaces × 2 centroids × 2 dims
    val books: Seq[Seq[Seq[Double]]] =
      Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)), Seq(Seq(0.0, 0.0), Seq(1.0, 1.0)))
    def enc(c: org.apache.spark.sql.Column) =
      GraftSql.column(graft.functions.PqEncode(GraftSql.expression(c), books))
    def lut(c: org.apache.spark.sql.Column) =
      GraftSql.column(graft.functions.PqLut(GraftSql.expression(c), books))
    val ok = Seq(Seq[java.lang.Double](1.0, 1.0, 0.1, 0.1)).toDF("v")
    assert(ok.select(enc(col("v"))).head.getSeq[Int](0) == Seq(1, 0))
    assert(!ok.select(lut(col("v"))).head.isNullAt(0))
    // a null ELEMENT → whole result null (same contract as PlaneBucket)
    val hasNull = Seq(Seq[java.lang.Double](1.0, null, 0.1, 0.1)).toDF("v")
    assert(hasNull.select(enc(col("v"))).head.isNullAt(0))
    assert(hasNull.select(lut(col("v"))).head.isNullAt(0))
    // a SHORT vector violates the fixed-width contract → loud error,
    // never an out-of-bounds UnsafeArrayData read
    val short = Seq(Seq[java.lang.Double](1.0, 1.0)).toDF("v")
    val e1 = intercept[Exception] { short.select(enc(col("v"))).collect() }
    assert(e1.getMessage.contains("codebook needs") ||
      Option(e1.getCause).exists(_.getMessage.contains("codebook needs")))
    val e2 = intercept[Exception] { short.select(lut(col("v"))).collect() }
    assert(e2.getMessage.contains("codebook needs") ||
      Option(e2.getCause).exists(_.getMessage.contains("codebook needs")))
  }

  test("ADC search == naive reconstruction scoring, bit for bit") {
    val e = graft.Tables.read(spark, sf(), "embeddings")
    val books = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
      m = M, ksub = Ksub, iters = 3, dim = Dim)
    val q = e.filter(col("vec_id") % 50 === 0)
    val got = Similarity.pqKnn(e, q, "vec_id", "embedding", k = 5,
        books = Some(books))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

    // naive single-threaded replay from the SAME codebooks: quantize,
    // encode by per-subspace argmin, score every pair as
    // <q, decode(n)> / (‖q‖·‖decode(n)‖) with the identical left folds
    val dsub = Dim / M
    val rows = e.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576.0))))
    def encode(v: Seq[Double]): Array[Int] =
      Array.tabulate(M) { s =>
        var best = -1; var bd = 0.0
        for (c <- 0 until Ksub) {
          val cv = books(s)(c)
          var acc = 0.0
          for (d <- 0 until dsub) {
            val diff = v(s * dsub + d) - cv(d); acc += diff * diff
          }
          if (best < 0 || acc < bd) { bd = acc; best = c }
        }
        best
      }
    val cnsq = books.map(_.map(cv => cv.foldLeft(0.0)((a, x) => a + x * x)))
    val enc = rows.map { case (id, v) => (id, encode(v)) }.toMap
    val want = rows.filter(_._1 % 50 == 0).flatMap { case (qid, qv) =>
      val qn = math.sqrt(qv.foldLeft(0.0)((a, x) => a + x * x))
      val lut = Array.tabulate(M, Ksub) { (s, c) =>
        val cv = books(s)(c)
        var acc = 0.0
        for (d <- 0 until dsub) acc += qv(s * dsub + d) * cv(d)
        acc
      }
      rows.filter(_._1 != qid).map { case (nid, _) =>
        val codes = enc(nid)
        val adc = (0 until M).foldLeft(0.0)((a, s) => a + lut(s)(codes(s)))
        val rn = math.sqrt(
          (0 until M).foldLeft(0.0)((a, s) => a + cnsq(s)(codes(s))))
        (nid, adc / (qn * rn))
      }.sortBy { case (nid, s) => (-s, nid) }.take(5).zipWithIndex.map {
        case ((nid, s), i) =>
          (qid, nid, i + 1,
            BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
      }
    }.toSet
    assert(got == want, s"ADC mismatch:\n got=${got.toSeq.sorted.take(10)}\n" +
      s"want=${want.toSeq.sorted.take(10)}")
  }

  test("probing every cell reduces IVF-PQ to flat PQ exactly") {
    val e = graft.Tables.read(spark, sf(), "embeddings")
      .select("vec_id", "embedding")
    val q = e.filter(col("vec_id") % 50 === 0)
    val books = Similarity.trainPqCodebooks(e, "vec_id", "embedding",
      m = M, ksub = Ksub, iters = 2, dim = Dim)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    // nProbe == nList → the candidate set is the whole corpus, so the
    // composition must return EXACTLY the flat-PQ ADC result
    val full = rows(Similarity.ivfPqKnn(e, q, "vec_id", "embedding",
      k = 5, nList = 8, nProbe = 8, iters = 2, books = Some(books)))
    val flat = rows(Similarity.pqKnn(e, q, "vec_id", "embedding",
      k = 5, books = Some(books)))
    assert(full == flat && full.nonEmpty)
  }

  test("recall@5 vs the exact baseline on real embeddings") {
    val e = graft.Tables.read(spark, sf(), "embeddings")
    val q = e.filter(col("vec_id") % 50 === 0)
    val approx = Similarity.pqKnn(e, q, "vec_id", "embedding", k = 5)
    val exact = Similarity.bruteForceKnn(e, q, "vec_id", "embedding", k = 5)
    val r = Similarity.knnRecall(approx, exact)
      .agg(avg("recall")).collect()(0).getDouble(0)
    // 8 bytes/vector is a 32× compression — recall tracks what 4-bit
    // codes can preserve on NEAR-UNIFORM synthetic vectors (the LSH
    // recall caveat: no angular cluster structure to exploit; measured
    // ≈0.26 here vs ≈0.003 for random guessing at N≈1.5k). The floor
    // documents the measured behavior; real clustered embeddings and
    // larger ksub both raise it
    assert(r >= 0.2, s"pq recall@5 = $r")
  }
}
