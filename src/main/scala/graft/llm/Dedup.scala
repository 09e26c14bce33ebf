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
  * the algorithm and local to a bucket; the Jaccard join additionally
  * prunes hot shingles by construction (prefix filtering ranks by global
  * frequency, so "stop-shingles" never enter the candidate index).
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

  /** Distinct HASHED word-n-gram shingles per document, in three shapes:
    * `ex` (doc_id, g32) distinct rows, `sizes` (doc_id, sz), and `sets`
    * (doc_id, s32 — sorted long array, for set-intersection verification).
    *
    * Two deliberate engineering choices, both measured:
    *  - shingles are built with posexplode + window `lead` (whole-stage
    *    codegen) instead of array higher-order functions (interpreted —
    *    ~0.7 ms/doc);
    *  - shingles become 32-bit md5-derived longs IMMEDIATELY, so every
    *    downstream join/groupBy/intersection runs on longs, not strings.
    *    The DuckDB oracles hash with the identical function, so results
    *    match exactly even in the (≈2^-32) event of a hash collision.
    *
    * `ex` is NOT persisted, deliberately: the downstream branches (freq,
    * prefix, verify sides) do recompute it, but the pipeline is cheap
    * whole-stage codegen after this rewrite and persisting it was
    * measured to change join strategies for the worse (InMemoryRelation
    * stats) — callers running many dedup passes over one corpus should
    * materialize the corpus themselves. */
  private def hashedShingles(
      df: DataFrame, idCol: String, textCol: String, n: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val wdf = df.select(col(idCol).as("doc_id"),
      posexplode(words(col(textCol))).as(Seq("pos", "word")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val leads = (1 until n).map(k => lead(col("word"), k).over(win).as(s"w$k"))
    val shingleParts = col("word") +: (1 until n).map(k => col(s"w$k"))
    val ex = wdf
      .select(col("doc_id") +: col("word") +: leads: _*)
      .filter(col(s"w${n - 1}").isNotNull)
      .select(col("doc_id"), hash32(concat_ws(" ", shingleParts: _*)).as("g32"))
      .distinct()
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val sets = ex.groupBy("doc_id")
      .agg(sort_array(collect_list(col("g32"))).as("s32"))
    (ex, sizes, sets)
  }

  /** Exact n-gram Jaccard near-dup pairs with PREFIX FILTERING (Chaudhuri
    * et al., the standard exact similarity-join pruning): order each doc's
    * shingles by ascending global document frequency and index only the
    * first |A| - ⌈τ·|A|⌉ + 1 of them; any pair with J ≥ τ must collide on
    * an indexed (rare) shingle, so candidate generation joins on rare
    * shingles only — lossless, and the hot "stop-shingles" that make a
    * naive shingle join quadratic never enter the index. Candidates are
    * then verified with an exact set intersection of the full shingle
    * arrays. Output: (id_a, id_b, inter, size_a, size_b, jaccard) with
    * jaccard >= tau and id_a < id_b — identical to brute force.
    *
    * Scale: the doc-frequency table and index are shingle-hash-partitioned;
    * the verify join is candidate-keyed. No all-pairs work, and the skew
    * that kills the naive join is pruned by construction. */
  def jaccardShinglePairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, tau: Double = 0.5): DataFrame = {
    val (ex, sizes, sets) = hashedShingles(df, idCol, textCol, n)
    val exSz = ex.join(sizes, "doc_id")
    val freq = ex.groupBy("g32").agg(count(lit(1)).as("df"))
    // Rank shingles within each doc by (global df, shingle); index the
    // prefix: rank <= sz - ceil(tau*sz) + 1.
    val w = Window.partitionBy("doc_id").orderBy(col("df"), col("g32"))
    val prefix = exSz.join(freq, "g32")
      .withColumn("rk", row_number().over(w))
      // ε guards FP noise in τ·sz: it can only LENGTHEN the prefix, so
      // pruning stays lossless.
      .filter(col("rk") <= col("sz") - ceil(lit(tau) * col("sz") - lit(1e-9)) + 1)
      .select("doc_id", "g32", "sz", "rk")
    // PPJoin residual filters, both lossless for J >= tau:
    //  - size compatibility: τ·|A| <= |B| <= |A|/τ;
    //  - positional: the suffixes after the colliding prefix entry must
    //    still be able to reach the required overlap
    //    α = ⌈τ/(1+τ)·(|A|+|B|)⌉.
    val alpha = ceil(
      lit(tau / (1 + tau)) * (col("a.sz") + col("b.sz")) - lit(1e-9))
    val cands = prefix.as("a")
      .join(prefix.as("b"),
        col("a.g32") === col("b.g32") && col("a.doc_id") < col("b.doc_id") &&
          col("b.sz") >= ceil(lit(tau) * col("a.sz") - lit(1e-9)) &&
          col("a.sz") >= ceil(lit(tau) * col("b.sz") - lit(1e-9)) &&
          least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")) + 1 >= alpha)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cands
      .join(sets.select(col("doc_id").as("id_a"), col("s32").as("sa")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("s32").as("sb")), "id_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("size_a", size(col("sa")))
      .withColumn("size_b", size(col("sb")))
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
    val (ex, _, sets) = hashedShingles(df, idCol, textCol, n)
    // All `numHashes` signature minima in ONE aggregation — no per-perm row
    // explosion (a numHashes× blowup measured as the bottleneck at sf0.1),
    // map-side partial mins, single shuffle keyed by doc.
    val permCols = permConstants(numHashes).map { case (i, a, b) =>
      min((lit(a) * col("g32") + lit(b)) % P).as(s"mh$i")
    }
    val sigs = ex.groupBy("doc_id").agg(permCols.head, permCols.tail: _*)

    // Banded signatures: band j concatenates mh[j*r .. j*r+r-1].
    val bandsDf = sigs.select(col("doc_id"),
      explode(array((0 until bands).map(j =>
        struct(lit(j).as("band"),
          concat_ws(",", (j * r until (j + 1) * r).map(i =>
            col(s"mh$i").cast("string")): _*).as("bkey"))): _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.bkey"))

    val cands = bandsDf.as("a")
      .join(bandsDf.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()

    // Full signatures (as an array) for the LSH estimate.
    val fullSig = sigs.select(col("doc_id"),
      array((0 until numHashes).map(i => col(s"mh$i")): _*).as("sig"))

    // Verify candidates with exact Jaccard on the (distinct) hashed sets.
    cands
      .join(sets.select(col("doc_id").as("id_a"), col("s32").as("sa")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("s32").as("sb")), "id_b")
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
