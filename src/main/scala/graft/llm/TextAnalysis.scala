package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps._

/** Text-analysis operators: token counting, quality scoring, language-ID
  * heuristic, document fingerprinting, JSON property extraction.
  *
  * All pure per-row column expressions (codegen'd, embarrassingly
  * parallel — trivially 100 TB-safe), each with an exact ANSI-SQL oracle:
  * integer counts, single-division ratios and fixed-order FP arithmetic
  * only, so results are bit-identical across engines.
  */
object TextAnalysis {

  /** Languages scored by the marker-word heuristic, in tie-break
    * precedence order. */
  val Langs: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "las", "que", "por"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

  /** Token counts: whitespace tokens and a BPE-ish regex tokenization
    * (letter runs / digit runs / single punctuation). */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      size(words(col(textCol))).as("n_ws_tokens"),
      size(regexp_extract_all(lower(col(textCol)),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("n_bpe_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Quality scoring: alphabetic ratio, average word length, stopword
    * ratio, and a fixed-order combined score. */
  def qualityScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = words(col(textCol))
    val nChars = length(col(textCol)).cast("double")
    val nAlpha = length(regexp_replace(col(textCol), "[^A-Za-z]", ""))
      .cast("double")
    val nWords = size(w).cast("double")
    val sumWlen = aggregate(transform(w, x => length(x)), lit(0),
      (acc, x) => acc + x).cast("double")
    val nStop = size(filter(w,
      x => x.isInCollection(Stopwords))).cast("double")
    val alphaRatio = nAlpha / nChars
    val stopRatio = nStop / nWords
    df.select(
      col(idCol).as("doc_id"),
      round(alphaRatio, 6).as("alpha_ratio"),
      round(sumWlen / nWords, 6).as("avg_word_len"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(
        lit(0.4) * alphaRatio + lit(0.4) * stopRatio +
          lit(0.2) * least(nWords / lit(100d), lit(1d)), 6).as("quality"))
  }

  /** Marker-word language-ID heuristic: per-language marker-occurrence
    * counts, predicted = argmax with fixed precedence (en→de→fr→es→zh). */
  def langId(df: DataFrame, idCol: String, textCol: String,
      actualCol: Option[String] = None): DataFrame = {
    val w = words(col(textCol))
    val scores = Langs.map { case (lang, markers) =>
      lang -> size(filter(w, x => x.isInCollection(markers)))
    }
    val pred = scores.tail.foldLeft(
      (when(lit(true), Langs.head._1), scores.head._2)) {
      case ((acc, best), (lang, s)) =>
        (when(s > best, lang).otherwise(acc), greatest(best, s))
    }._1
    val base = Seq(col(idCol).as("doc_id")) ++
      scores.map { case (l, s) => s.as(s"score_$l") } :+ pred.as("pred_lang")
    val cols = actualCol match {
      case Some(a) => base ++ Seq(col(a).as("actual_lang"),
        (pred === col(a)).as("match"))
      case None => base
    }
    df.select(cols: _*)
  }

  /** Position-weighted document fingerprint: a polynomial-style rolling
    * hash, order-sensitive (so permuted documents fingerprint differently)
    * but computed with order-independent integer sums so it is
    * shuffle-safe: fp = Σ_i h32(w_i)·((i-1) mod 64 + 1) mod P. */
  def fingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      (aggregate(
        zip_with(
          transform(words(col(textCol)), x => hash32(x)),
          transform(sequence(lit(1), size(words(col(textCol)))),
            i => ((i - 1) % 64 + 1).cast("long")),
          (h, p) => (h * p) % P),
        lit(0L), (acc, x) => acc + x) % P).as("fp"))

  /** Repetition metrics (the Gopher-rule family used to filter
    * low-quality training text): duplicate-bigram fraction and
    * most-frequent-bigram share. High values flag degenerate/repetitive
    * documents.
    *
    * Entirely per-row: the bigram array is sorted and the
    * most-frequent-bigram count is the longest equal-run in the sorted
    * array (a single `aggregate` fold) — ZERO shuffles, replacing the
    * earlier two corpus-wide groupBys over the exploded bigram relation
    * (shuffle volume ~token count — the dominant cost at scale). Docs
    * with <2 words yield no row, as the exploded formulation did. */
  def repetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val maxRun = {
      val z = struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"))
      aggregate(sort_array(col("gs")), z,
        (acc, x) => {
          val run = when(x === acc.getField("prev"),
            acc.getField("run") + 1).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    }
    df.select(col(idCol).as("doc_id"), words(col(textCol)).as("w"))
      .select(col("doc_id"), wordNgrams("w", 2).as("gs"))
      .filter(size(col("gs")) > 0)
      .select(
        col("doc_id"),
        size(col("gs")).cast("long").as("n_bigrams"),
        size(array_distinct(col("gs"))).cast("long").as("distinct_bigrams"),
        maxRun.as("top_bigram_count"))
      .select(
        col("doc_id"), col("n_bigrams"), col("distinct_bigrams"),
        col("top_bigram_count"),
        round((col("n_bigrams") - col("distinct_bigrams")).cast("double") /
          col("n_bigrams"), 6).as("dup_bigram_ratio"),
        round(col("top_bigram_count").cast("double") / col("n_bigrams"), 6)
          .as("top_bigram_ratio"))
  }

  /** Corpus-level top-k tokens by frequency (vocabulary head analysis):
    * explode → map-side-combined count → TakeOrdered top-k (no global
    * sort; the driver receives k rows per partition at most). Ties break
    * on the token string for determinism. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(words(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Per-document top-k TF-IDF terms — the topic/quality fingerprint a
    * curation pipeline attaches before filtering or clustering.
    * tf = term count in the doc; idf = ln(N/df) with df = #docs
    * containing the term and N a driver-side scalar (licensed — one
    * count). Output: (doc_id, term, rank, score), rank by
    * (score DESC, term) — ranking uses the ROUNDED score so cross-engine
    * sub-6dp log differences cannot reorder ties.
    *
    * Plan: token explode → two map-side-combined groupBys (doc-term tf,
    * term df) → df join (term-keyed, broadcast-able: |vocab| ≪ |tokens|)
    * → per-doc-keyed window. The explode is the standard inverted-index
    * shuffle; nothing is quadratic and nothing but N reaches the driver. */
  def tfIdf(
      df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = df.count()
    val terms = df.select(col(idCol).as("doc_id"),
      explode(words(col(textCol))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = terms.distinct().groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .withColumn("score",
        round(col("tf") * log(lit(n.toDouble) / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "rank", "score")
  }

  /** Document-length histogram: power-of-two char-length bins — the
    * corpus shape summary a pipeline checks before/after filtering.
    * Per-row bin arithmetic + one small groupBy. The bin index is
    * INTEGER-exact (digit count of the binary rendering, not
    * floor(log2) — FP log at power-of-two boundaries can differ by an
    * ulp across engines), with 0-length docs in bin -1. */
  def lengthHistogram(df: DataFrame, textCol: String): DataFrame = {
    val n = length(col(textCol))
    val binIdx = when(n <= 0, lit(-1))
      .otherwise(length(org.apache.spark.sql.functions.bin(n.cast("long"))) - 1)
    df.select(binIdx.as("len_bin"))
      .groupBy("len_bin").agg(count(lit(1)).as("n_docs"))
      .withColumn("bin_lo",
        when(col("len_bin") < 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), len_bin)")))
  }

  /** JSON property extraction from a string column (the `events.props`
    * shape): `get_json_object` — codegen'd, no UDF. */
  def jsonExtract(df: DataFrame, idCol: String, jsonCol: String,
      path: String, outCol: String): DataFrame =
    df.select(col(idCol),
      get_json_object(col(jsonCol), path).cast("long").as(outCol))

  /** Fixed-size token chunking — the context-window prep step of a
    * training pipeline: each document becomes ⌈n/k⌉ chunks of `k`
    * whitespace tokens (final chunk short), output one row per chunk
    * `(doc_id, chunk_idx, chunk_text, n_tokens)`. Pure per-row array
    * expressions + one `explode` — no shuffle, no UDF; output order is
    * irrelevant (chunk_idx carries position). The word array is bound
    * ONCE via the one-element-array wrapper (see [[TextOps.wordNgrams]]
    * — CSE does not reach lambda bodies). `ceil(n / k)` uses double
    * division — exact across engines for any realistic n (quotients at
    * integer values are exactly representable). */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64): DataFrame = {
    val k = chunkTokens
    require(k > 0, "chunkTokens must be positive")
    val pre = df.select(col(idCol).as("doc_id"),
      words(col(textCol)).as("__w"))
    val chunks = expr(
      s"""element_at(transform(array(__w), arr ->
         |  transform(sequence(0,
         |      greatest(CAST(ceil(size(arr) / $k.0D) AS INT), 1) - 1),
         |    i -> struct(i AS ci,
         |                concat_ws(' ', slice(arr, i * $k + 1, $k)) AS ct,
         |                greatest(least(size(arr) - i * $k, $k), 0) AS nt))),
         |  1)""".stripMargin)
    pre.select(col("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.ci").as("chunk_idx"),
        col("c.ct").as("chunk_text"), col("c.nt").as("n_tokens"))
  }
}
