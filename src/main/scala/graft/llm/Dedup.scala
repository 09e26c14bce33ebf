package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps._

/** Deduplication operators for large-scale training-data pipelines: exact,
  * n-gram-Jaccard, MinHash-LSH and SimHash near-dup detection.
  *
  * Scale posture (the 100 TB contract): every operator is bucketed — work
  * is keyed by content hash, shingle, LSH band, or SimHash band, so the
  * only shuffles are hash-partitioned groupBys/joins and NOTHING ever
  * all-pairs-crossJoins or collects document data to the driver. The one
  * quadratic corner (two documents sharing a band/shingle) is inherent to
  * the algorithm and local to a bucket; for adversarial skew (a shingle
  * shared by millions of docs) cap bucket width with `maxBucketWidth`,
  * which drops super-frequent shingles — the standard "stop-shingle"
  * mitigation.
  */
object Dedup {

  /** Exact dedup over normalized text: one group per md5(normalized),
    * keeping the smallest id as the canonical document.
    * Output: (keep_id, n_dups, text_hash). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), md5(normText(col(textCol))).as("text_hash"))
      .groupBy("text_hash")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups", "text_hash")

  /** Keep-one-per-group exact dedup returning the surviving rows
    * (row_number over the content hash — the materializing variant). */
  def dropExactDuplicates(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(normText(col(textCol))))
      .orderBy(col(idCol))
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /** Per-document distinct word-n-gram shingle sets: (doc_id, s). */
  private def shingleSets(
      df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"), words(col(textCol)).as("w"))
      .select(col("doc_id"), array_distinct(wordNgrams("w", n)).as("s"))

  /** Exact n-gram Jaccard near-dup pairs via shingle-bucketed candidate
    * generation: docs sharing ≥1 shingle are candidates (exact — Jaccard>0
    * implies a shared shingle), intersections are counted by a
    * shingle-keyed join + groupBy, never an all-pairs scan.
    * Output: (id_a, id_b, inter, size_a, size_b, jaccard) with
    * jaccard >= tau and id_a < id_b.
    *
    * `maxBucketWidth`: drop shingles shared by more than this many docs
    * (0 = keep all). Capping makes the candidate join near-linear on real
    * corpora at the cost of missing pairs whose ONLY shared shingles are
    * super-frequent — acceptable for near-dup work where τ is high. */
  def jaccardShinglePairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tau: Double = 0.5, maxBucketWidth: Int = 0): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, n)
    val sizes = sh.select(col("doc_id"), size(col("s")).as("sz"))
    val ex0 = sh.select(col("doc_id"), explode(col("s")).as("g"))
    val ex =
      if (maxBucketWidth <= 0) ex0
      else {
        val wide = ex0.groupBy("g").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") > maxBucketWidth).select("g")
        ex0.join(broadcast(wide), Seq("g"), "left_anti")
      }
    val pairs = ex.as("a")
      .join(ex.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("sz", "size_a"), "id_a")
      .join(sizes.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("sz", "size_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("size_a") + col("size_b") - col("inter")), 6))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
  }

  /** MinHash-LSH near-dup pairs: shingle → 32-bit hash → `numHashes`
    * permutation minima → `bands` banded signatures → candidates = pairs
    * agreeing on ≥1 full band → exact-Jaccard verification of candidates
    * only. Candidate generation is a plain equi-join on (band, band
    * signature) — hash-partitioned, no all-pairs work anywhere.
    * Output: (id_a, id_b, est_sim, jaccard) with jaccard >= tau.
    *
    * est_sim = fraction of agreeing minhashes (the LSH estimate); jaccard
    * is the exact verified similarity. Hashes are md5-derived and the
    * permutations are fixed constants, so the whole pipeline is
    * reproducible in ANSI SQL (see LlmQueries' oracle). */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 16, bands: Int = 4,
      tau: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val spark = df.sparkSession
    import spark.implicits._

    val sh = shingleSets(df, idCol, textCol, n)
    val ex = sh.select(col("doc_id"), explode(col("s")).as("g"))
    val hashed = ex.select(col("doc_id"), hash32(col("g")).as("h"))
    val perms = broadcast(
      permConstants(numHashes).toDF("pi", "pa", "pb"))
    // Signature minima: map-side partial min, one shuffle keyed by doc.
    val sigs = hashed.join(perms)
      .select(col("doc_id"), col("pi"),
        ((col("pa") * col("h") + col("pb")) % P).as("hv"))
      .groupBy("doc_id", "pi").agg(min("hv").as("mh"))

    // Banded signatures: deterministic order via sort_array over (pi, mh).
    val bandsDf = sigs
      .withColumn("band", expr(s"pi div $r"))
      .groupBy("doc_id", "band")
      .agg(expr(
        "array_join(transform(sort_array(collect_list(struct(pi, mh)))," +
          " x -> cast(x.mh AS STRING)), ',')").as("bkey"))

    val cands = bandsDf.as("a")
      .join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    // Full signatures for the LSH estimate.
    val fullSig = sigs.groupBy("doc_id")
      .agg(expr(
        "transform(sort_array(collect_list(struct(pi, mh))), x -> x.mh)")
        .as("sig"))

    // Verify candidates with exact Jaccard on the (distinct) shingle sets.
    cands
      .join(sh.select(col("doc_id").as("id_a"), col("s").as("sa")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("s").as("sb")), "id_b")
      .join(fullSig.select(col("doc_id").as("id_a"), col("sig").as("siga")), "id_a")
      .join(fullSig.select(col("doc_id").as("id_b"), col("sig").as("sigb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("inter")), 6))
      .withColumn("est_sim",
        round(size(filter(zip_with(col("siga"), col("sigb"),
          (x, y) => x === y), b => b)).cast("double") / numHashes, 6))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "est_sim", "jaccard")
  }

  /** SimHash near-dup pairs over word bigrams (unigrams collapse on small
    * vocabularies): 32-bit simhash, banded candidate generation (4 bytes —
    * by pigeonhole any pair with hamming ≤ 3 agrees on ≥1 byte, so recall
    * is EXACT for hammingMax ≤ bands-1), verified with
    * bit_count(xor) <= hammingMax. Output: (id_a, id_b, hamming). */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      hammingMax: Int = 3): DataFrame = {
    val grams = df
      .select(col(idCol).as("doc_id"), words(col(textCol)).as("w"))
      .select(col("doc_id"), explode(wordNgrams("w", 2)).as("g"))
    val hashed = grams.select(col("doc_id"), hash32(col("g")).as("h"))
    // 32 per-bit ±1 sums in ONE aggregation (codegen-friendly, single
    // shuffle), then assemble the fingerprint.
    val bitSums = (0 until 32).map(k =>
      sum(when(shiftright(col("h"), k).bitwiseAND(lit(1L)) === 1, 1)
        .otherwise(-1)).as(s"b$k"))
    val sims = hashed.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(k =>
          when(col(s"b$k") > 0, lit(1L << k)).otherwise(lit(0L)))
          .reduce(_ + _).as("sh"))
    // Banded candidates: 4 bytes of the fingerprint.
    val banded = sims.select(col("doc_id"), col("sh"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sh"), 8 * b).bitwiseAND(lit(255L)).as("bv"))): _*))
        .as("e"))
      .select(col("doc_id"), col("sh"), col("e.band"), col("e.bv"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingMax)
  }
}
