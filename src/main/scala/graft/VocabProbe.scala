package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Realistic-vocabulary contrast for the sparse lexical path
  * (VERDICT r8 #6): the synthetic corpus has a 31-term vocabulary, so
  * `knn_sparse_tfidf`'s postings probe volume is the DENSE worst case —
  * every query shares terms with every document — and the measured cost
  * says nothing about the operator's real (much better) scaling. This
  * probe synthesizes a same-shape corpus (same doc count, same words per
  * doc) over a ~10⁴-term ZIPFIAN vocabulary (rank drawn by inverse-CDF:
  * r = ⌊exp(u·ln V)⌋ gives P(r) ∝ 1/r, the classic term-frequency law),
  * then reports, for both corpora:
  *   - postings rows (the inverted-index size),
  *   - PROBE VOLUME: |postings ⋈ query-postings on term| — the
  *     candidate-generation cost that drives the operator at scale,
  *   - the timed query (median of 3, same discipline as Bench).
  *
  * Usage: runMain graft.VocabProbe [baseSfDir] [outDir]
  * Writes parquet only under the repo-local outDir (default tmp_zipfdocs)
  * and patches STATUS.md between the ZIPF markers. */
object VocabProbe {

  private def mix(parts: Long*): Long = {
    var x = 0x9e3779b97f4a7c15L
    parts.foreach { p =>
      x ^= p + 0x9e3779b97f4a7c15L + (x << 6) + (x >>> 2)
      x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 27
    }
    x & Long.MaxValue
  }

  final case class Doc(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)

  /** Same doc count / words-per-doc as the base corpus, Zipfian vocab.
    * `scaleUp` multiplies the doc count (the 10× decade for the scaling
    * contrast). */
  def ensureZipfCorpus(spark: SparkSession, baseDir: String, outDir: String,
      vocab: Int = 10000, scaleUp: Int = 1): Unit = {
    import spark.implicits._
    if (new java.io.File(s"$outDir/documents.parquet").exists()) return
    val base = Tables.read(spark, baseDir, "documents")
    val nDocs = base.count() * scaleUp
    val wordsPerDoc = 54 // the base corpus's mean words/doc
    val lnV = math.log(vocab.toDouble)
    spark.range(0L, nDocs, 1L, 32).as[Long]
      .map { i =>
        val text = (0 until wordsPerDoc).map { j =>
          val u = (mix(i, j.toLong) % 1000000L) / 1000000.0
          val rank = math.max(1L, math.exp(u * lnV).toLong)
          s"t$rank"
        }.mkString(" ")
        Doc(i, text, "en", "zipf", text.length.toLong)
      }
      .toDF()
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** The candidate-generation volume of the sparse kNN's postings probe:
    * Σ_t df(t) · qdf(t) over the query predicate — counted by replaying
    * the operator's own index-build stages. `maxDfFraction` mirrors the
    * operator's stop-term prune. */
  private def probeVolume(spark: SparkSession, dir: String,
      maxDfFraction: Double = 1.0): (Long, Long, Long) = {
    val docs = Tables.read(spark, dir, "documents")
    val n = docs.count()
    val terms = docs.select(col("doc_id"),
      explode(graft.llm.TextOps.words(col("text"))).as("term"))
    val tf0 = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val kept = tf0.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") <= lit(math.ceil(n * maxDfFraction).toLong))
      .select("term")
    val tf = tf0.join(kept, "term")
    val postings = tf.count()
    val nTerms = tf.select("term").distinct().count()
    val q = tf.filter(col("doc_id") % 50 === 0)
      .select(col("term"), col("doc_id").as("qid"))
    val volume = tf.join(q, "term")
      .filter(col("doc_id") =!= col("qid")).count()
    (nTerms, postings, volume)
  }

  /** Median-of-3 timing of the operator itself at a given prune. */
  private def timeKnn(spark: SparkSession, dir: String,
      maxDfFraction: Double): (Double, Long) = {
    def once(): (Double, Long) = {
      val df = graft.llm.Similarity.sparseTfidfKnn(
        Tables.read(spark, dir, "documents"), "doc_id", "text",
        queryPred = col("doc_id") % 50 === 0, k = 5,
        maxDfFraction = maxDfFraction)
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    once() // warm
    val runs = (1 to 3).map(_ => once())
    (runs.map(_._1).sorted.apply(1), runs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "tmp_zipfdocs"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensureZipfCorpus(spark, baseDir, outDir)
    // the 10× decade of the SAME Zipfian corpus: the dense synthetic
    // vocabulary measured 39×/decade in BENCH_10x — this row is the
    // realistic-sparsity counterpart
    ensureZipfCorpus(spark, baseDir, outDir + "10", scaleUp = 10)
    // full-vocabulary rows (the declared query's exact semantics) plus
    // the stop-term-pruned production configuration on the Zipf corpora
    val rows = Seq(
      ("synthetic-31", baseDir, 1.0),
      ("zipf-1e4", outDir, 1.0),
      ("zipf-1e4-x10", outDir + "10", 1.0),
      ("zipf-1e4 pruned .5", outDir, 0.5),
      ("zipf-1e4-x10 pruned .5", outDir + "10", 0.5)).map {
      case (label, dir, mdf) =>
        val (nTerms, postings, volume) = probeVolume(spark, dir, mdf)
        val (t, n) = timeKnn(spark, dir, mdf)
        (label, nTerms, postings, volume, t, n)
    }
    val table = (
      Seq("| corpus | vocab | postings | probe volume | knn s | out rows |",
        "|---|---|---|---|---|---|") ++
      rows.map { case (l, v, p, vol, t, n) =>
        f"| $l | $v%,d | $p%,d | $vol%,d | $t%.2f | $n%,d |" }
      ).mkString("\n")
    println(table)
    // patch STATUS.md between the ZIPF markers (same pattern as the 10×
    // standing table in Bench)
    try {
      val p = java.nio.file.Paths.get("STATUS.md")
      val (begin, end) = ("<!-- ZIPF_BEGIN -->", "<!-- ZIPF_END -->")
      val md = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      val (b, e) = (md.indexOf(begin), md.indexOf(end))
      if (b >= 0 && e > b) {
        val patched = md.substring(0, b + begin.length) +
          "\n" + table + "\n" + md.substring(e)
        java.nio.file.Files.write(p, patched.getBytes("UTF-8"))
      }
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
