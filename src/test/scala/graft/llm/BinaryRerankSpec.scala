package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Binary-quantization ANN: the banded join returns EXACTLY the
  * hamming <= 3 candidate set (checked against an in-memory sketch
  * reference), reranked sims are exact cosine, and radius widening is
  * monotone. */
class BinaryRerankSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val signs = Similarity.planeSigns(64, dim)

  // deterministic pseudo-vectors
  private def vec(id: Long): Array[Float] =
    Array.tabulate(dim) { d =>
      val z = id * 31L + d * 7L + 3L
      ((z % 17L) - 8L).toFloat / 8f
    }

  private def sketch(v: Array[Float]): (Long, Long) = {
    def bits(rows: Seq[Seq[Int]]): Long =
      rows.zipWithIndex.foldLeft(0L) { case (acc, (p, j)) =>
        var s = 0.0
        var d = 0
        while (d < dim) { s += v(d).toDouble * p(d); d += 1 }
        if (s > 0) acc | (1L << j) else acc
      }
    (bits(signs.slice(0, 32)), bits(signs.slice(32, 64)))
  }

  private def hamming(a: (Long, Long), b: (Long, Long)): Int =
    java.lang.Long.bitCount(a._1 ^ b._1) +
      java.lang.Long.bitCount(a._2 ^ b._2)

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    def dot(x: Array[Float], y: Array[Float]) =
      x.indices.foldLeft(0.0)((s, i) => s + x(i).toDouble * y(i).toDouble)
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  }

  test("candidates equal the exact hamming radius; sims are exact cosine") {
    val ids = (1L to 120L)
    val corpus = ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")
    // probes: the corpus vectors of ids % 10 == 0, slightly corrupted
    // (first element zeroed) — close in sketch space to their source
    val qids = ids.filter(_ % 10 == 0)
    val qvecs = qids.map { i =>
      val v = vec(i).clone(); v(0) = 0f; (i, v)
    }
    val q = qvecs.toDF("vec_id", "embedding")
    val got = Similarity.binaryRerankKnn(corpus, q, "vec_id", "embedding",
        k = 5, hammingMax = 3, dim = dim)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    // in-memory reference: sketch both sides, hamming filter, cosine,
    // top-5 by (sim DESC, nid)
    val skC = ids.map(i => i -> sketch(vec(i))).toMap
    val want = qvecs.flatMap { case (qid, qv) =>
      val sq = sketch(qv)
      ids.filter(n => hamming(skC(n), sq) <= 3)
        .map(n => (n, BigDecimal(cos(qv, vec(n)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
        .sortBy { case (n, s) => (-s, n) }
        .take(5)
        .map { case (n, s) => (qid, n) -> s }
    }.toMap
    assert(got == want)
    assert(want.nonEmpty)
    // every probe whose corrupted sketch stays within the radius of its
    // source (per the reference) is recovered — and with top-5 ties
    // breaking on nid ASC, the source appears iff it ranks
    qvecs.foreach { case (qid, qv) =>
      if (hamming(sketch(qv), skC(qid)) <= 3 && want.contains((qid, qid)))
        assert(got.contains((qid, qid)), s"probe $qid missed source")
    }
    assert(qids.exists(i => got.contains((i, i)))) // some probe recovers
  }

  test("radius is monotone: hammingMax = 0 results are a subset of 3") {
    val corpus = (1L to 60L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    def pairs(h: Int) =
      Similarity.binaryRerankKnn(corpus, corpus, "vec_id", "embedding",
          k = 60, hammingMax = h, dim = dim)
        .select("qid", "nid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val p0 = pairs(0)
    val p3 = pairs(3)
    assert(p0.subsetOf(p3))
    // hamming 0 always includes self-pairs (no self-exclusion)
    assert((1L to 60L).forall(i => p0.contains((i, i))))
  }
}
