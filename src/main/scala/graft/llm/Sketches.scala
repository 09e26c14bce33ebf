package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Approximate-query sketches — the summary structures a 100 TB pipeline
  * uses where exact answers are either unaffordable or unnecessary:
  * HyperLogLog distinct counting, Count-Min frequency estimation, and a
  * Bloom-filter semi-join prefilter.
  *
  * Everything is DETERMINISTIC on purpose. Standard sketch libraries
  * (DataSketches, Spark's own `approx_count_distinct`) hash with
  * engine-private functions, so their estimates can't be checked by an
  * independent engine. Here every hash is the portable 32-bit
  * md5-derived [[TextOps.hash32]] and every register update is integer
  * arithmetic, so DuckDB can replay the EXACT sketch — registers,
  * estimate and all — and the driver's hash-compare gate applies to
  * approximate operators just like exact ones.
  *
  * Scale posture: each sketch is one map-side-combinable aggregation
  * over a tiny fixed key space (≤2048 groups), i.e. a shuffle of a few
  * KB regardless of input size — the whole point of sketching.
  */
object Sketches {

  // ── HyperLogLog ────────────────────────────────────────────────────────

  /** Register count m = 2^8. At 31 KB of state per 10^9 inputs this is
    * the classic "count distinct users over a year of events without a
    * 100 TB shuffle" trade: ~6.5% standard error. */
  val HllM = 256
  /** Bits of the 32-bit hash used for the rank: 32 - 8. Rank values are
    * in [1, 25] (25 = all rank bits zero). */
  val HllRankBits = 24

  /** alpha_m * m^2 * 2^HllRankBits, precomputed in ONE place and injected
    * into both engines as the same decimal literal: the estimate is this
    * constant divided by the exact-integer register denominator, so both
    * engines perform a single identical IEEE division. alpha_m for
    * m >= 128 is 0.7213 / (1 + 1.079/m) (Flajolet et al. 2007). */
  val HllAlphaNumerator: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM *
      (1L << (HllRankBits + 1)).toDouble
  /** Below 2.5m the raw estimator is biased; linear counting takes over. */
  val HllLinearThreshold: Double = 2.5 * HllM

  /** The 8-bit register index for a key. */
  def hllBucket(c: Column): Column =
    shiftright(hash32(c.cast("string")), HllRankBits)

  /** The register candidate value (leading zeros in the rank bits, +1 —
    * computed as an INTEGER binary digit count, no FP log2). */
  def hllRank(c: Column): Column = {
    val rem = hash32(c.cast("string"))
      .bitwiseAND(lit((1L << HllRankBits) - 1))
    when(rem === 0L, lit(HllRankBits + 1))
      .otherwise(lit(HllRankBits + 1) - length(bin(rem)))
  }

  /** The register table `(bucket, m)` — a 256-group max aggregation.
    * Registers are a MONOTONE MAX: order-, partitioning- and
    * replay-insensitive, which is what makes the streaming twin
    * ([[graft.streaming.StreamingOps.hllRegistersStream]]) exactly equal
    * to this batch build. */
  def hllRegisters(df: DataFrame, keyCol: String): DataFrame =
    hllRegistersBy(df, keyCol, Nil)

  /** Register tables PER GROUP `(groupCols…, bucket, m)` — one
    * 256-register sketch per group (e.g. per event-time window:
    * distinct users per hour). The group columns must already exist on
    * `df`. State is 256 rows × |groups|. */
  def hllRegistersBy(
      df: DataFrame, keyCol: String, groupCols: Seq[String]): DataFrame =
    // NULL keys carry no identity: countDistinct ignores them, so the
    // sketch must too. Without this filter a NULL key hashed to a
    // (bucket=NULL, m=NULL) row that hllEstimate counted in n_present but
    // not present_sum — one bucket short in the denominator (ADVICE r5).
    df.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) :+ hllBucket(col(keyCol)).as("bucket") :+
        hllRank(col(keyCol)).as("rank"): _*)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max("rank").as("m"))

  /** Finishing step: registers → ONE estimate row
    * `(est_hll, method, registers_nonzero, denom)`. Separated from the
    * register build so a maintained register table (e.g. a streaming
    * snapshot) can be estimated without rescanning the input.
    *
    * Determinism: the denominator sum(2^(RankBits+1-M[j])) is EXACT in
    * a BIGINT (≤ 256·2^25 < 2^34); the one division happens on
    * bit-identical doubles in both engines. Linear counting
    * (`m·ln(m/V)`) only involves ln on an exact ratio, rounded to 4dp —
    * the same ln-then-round treatment the tf-idf oracle already proved
    * portable. */
  def hllEstimate(regs: DataFrame): DataFrame = hllEstimateBy(regs, Nil)

  /** Per-group finishing step over [[hllRegistersBy]] output:
    * `(groupCols…, est_hll, method, registers_nonzero, denom)`. */
  def hllEstimateBy(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    // coalesce: an EMPTY register table (no input at all) must finish as
    // v = m → linear counting → estimate 0, not a NULL-poisoned denom
    val agg = regs.groupBy(groupCols.map(col): _*).agg(
      coalesce(sum(expr(
        s"shiftleft(CAST(1 AS BIGINT), ${HllRankBits + 1} - m)")), lit(0L))
        .as("present_sum"),
      count(lit(1)).as("n_present"))
    // register scale is 2^(RankBits+1): present buckets contribute
    // 2^(RankBits+1-M), empty buckets M=0 contribute the full 2^(RankBits+1)
    val denom = (col("present_sum") +
      (lit(HllM) - col("n_present")) * lit(1L << (HllRankBits + 1))).as("denom")
    val withDenom = agg.select(groupCols.map(col) ++ Seq(
      denom, (lit(HllM) - col("n_present")).as("v"),
      col("n_present").as("registers_nonzero")): _*)
    val raw = lit(HllAlphaNumerator) / col("denom").cast("double")
    val linear = lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("v").cast("double"))
    withDenom.select(groupCols.map(col) ++ Seq(
      round(when(raw <= HllLinearThreshold && col("v") > 0, linear)
        .otherwise(raw), 4).as("est_hll"),
      when(raw <= HllLinearThreshold && col("v") > 0, "linear")
        .otherwise("raw").as("method"),
      col("registers_nonzero"),
      col("denom")): _*)
  }

  /** HyperLogLog distinct-count estimate of `keyCol` plus the exact
    * count as the accuracy yardstick (drop the exact half on real 100 TB
    * runs — it's the expensive one), as ONE row
    * `(n_exact, est_hll, method, registers_nonzero, denom)`. */
  def hllDistinct(df: DataFrame, keyCol: String): DataFrame =
    df.select(countDistinct(col(keyCol)).as("n_exact"))
      .crossJoin(hllEstimate(hllRegisters(df, keyCol)))
      .select("n_exact", "est_hll", "method", "registers_nonzero", "denom")

  // ── KMV (k-minimum-values) set-operation sketch ────────────────────────

  /** Sketch size for KMV: the k smallest key hashes. 256 longs per set. */
  val KmvK = 256

  /** KMV distinct-set-operation estimates for the two sub-populations of
    * `df` labeled `labelA` / `labelB` in `labelCol` (e.g. users who
    * clicked vs users who viewed): ONE row with exact and estimated
    * |A|, |B|, |A∪B| and |A∩B|.
    *
    * This is the set algebra HyperLogLog cannot do: registers union but
    * never intersect. KMV keeps the k SMALLEST key hashes per set — a
    * uniform sample of the hash space — so union is merge+trim and the
    * intersection follows from the Jaccard fraction within the merged
    * bottom-k (Beyer et al. 2007). Everything is integer arithmetic
    * until the final (k-1)·2^32 / kthMinHash divisions, which both
    * engines perform on identical operands — the estimates themselves
    * hash-match the oracle, like the other sketches.
    *
    * A set with fewer than k distinct hashes is COMPLETE in its sketch:
    * the estimator switches to the exact sketch size (the standard KMV
    * small-set rule), keeping estimates exact in that regime — the spec
    * exercises both branches.
    *
    * [[kmvSetEstimates]] is the PURE sketch path — what a deployment
    * runs (per-label bottom-k registers, then arithmetic on ≤2k rows);
    * [[kmvSetOps]] additionally computes the exact distinct counts
    * beside it as yardsticks. The exact side is the expensive half — a
    * full distinct shuffle of the data that grows with N while the
    * sketch path's post-register work is constant — so the yardstick
    * variant belongs in specs, not on the measured path (the
    * [[cmsTopK]]/`SketchSpec` split, VERDICT r6 #7 applied to KMV). */
  def kmvSetEstimates(
      df: DataFrame, keyCol: String, labelCol: String,
      labelA: String, labelB: String, k: Int = KmvK): DataFrame = {
    val lab = col(labelCol)
    // bottom-k distinct per label via the bounded Aggregator (map-side
    // partial, ≤k rows shuffled per partition — no per-label window over
    // the full distinct hash set)
    val bottom = kmvRegisters(
      df.filter(lab === labelA || lab === labelB), keyCol, labelCol, k)
      .select(col("lab"), explode(col("hashes")).as("h"))
    // grouping-less conditional aggregate: ONE stats row for both sets
    // (provably single-row for the plan audit's structural BNLJ license)
    val perSet = bottom.agg(
      max(when(col("lab") === labelA, col("h"))).as("kthA"),
      sum(when(col("lab") === labelA, 1L).otherwise(0L)).as("szA"),
      max(when(col("lab") === labelB, col("h"))).as("kthB"),
      sum(when(col("lab") === labelB, 1L).otherwise(0L)).as("szB"))
    def est(kth: Column, sz: Column): Column =
      when(sz < k, sz.cast("double"))
        .otherwise(lit((k - 1).toDouble * 4294967296.0) / kth.cast("double"))
    // merged bottom-k of the union; mark hashes present in both sketches
    val aSet = bottom.filter(col("lab") === labelA).select(col("h"))
    val bSet = bottom.filter(col("lab") === labelB).select(col("h"))
    val merged = aSet.withColumn("inA", lit(1))
      .join(bSet.withColumn("inB", lit(1)), Seq("h"), "full_outer")
      .select(col("h"), coalesce(col("inA"), lit(0)).as("inA"),
        coalesce(col("inB"), lit(0)).as("inB"))
      .orderBy("h").limit(k)
    val uAgg = merged.agg(max("h").as("ukth"), count(lit(1)).as("usz"),
      sum(col("inA") * col("inB")).as("both"))
    val estU = est(col("ukth"), col("usz"))
    val estI = (col("both").cast("double") / col("usz").cast("double")) * estU
    // both sides are grouping-less aggregates — provably 1 row each (the
    // plan audit's structural BNLJ license)
    perSet.select(
        round(est(col("kthA"), col("szA")), 4).as("est_a"),
        round(est(col("kthB"), col("szB")), 4).as("est_b"))
      .crossJoin(uAgg.select(round(estU, 4).as("est_union"),
        round(estI, 4).as("est_inter")))
  }

  /** [[kmvSetEstimates]] plus the exact distinct counts as yardsticks —
    * the spec-side variant (`SketchSpec` proves the estimates land
    * within the KMV error envelope against them). */
  def kmvSetOps(
      df: DataFrame, keyCol: String, labelCol: String,
      labelA: String, labelB: String, k: Int = KmvK): DataFrame = {
    val lab = col(labelCol)
    val exact = df.filter(lab === labelA || lab === labelB)
      .select(lab.as("lab"), col(keyCol).as("key")).distinct()
      .agg(
        countDistinct(when(col("lab") === labelA, col("key"))).as("n_exact_a"),
        countDistinct(when(col("lab") === labelB, col("key"))).as("n_exact_b"),
        countDistinct(col("key")).as("n_exact_union"))
      .withColumn("n_exact_inter",
        col("n_exact_a") + col("n_exact_b") - col("n_exact_union"))
    exact.crossJoin(kmvSetEstimates(df, keyCol, labelCol, labelA, labelB, k))
      .select(col("n_exact_a"), col("est_a"), col("n_exact_b"), col("est_b"),
        col("n_exact_union"), col("est_union"),
        col("n_exact_inter"), col("est_inter"))
  }

  /** Per-label KMV register sets `(lab, hashes)` — the bottom-k distinct
    * key hashes per label, via [[graft.functions.BottomKDistinctAgg]]
    * (map-side partial, ≤k rows shuffled per partition). Works on
    * streams unchanged ([[graft.streaming.StreamingOps.kmvRegistersStream]]):
    * bottom-k-distinct ignores ordering AND repetition, so the
    * maintained registers are out-of-order- and replay-safe, like the
    * HLL max. */
  def kmvRegisters(
      df: DataFrame, keyCol: String, labelCol: String,
      k: Int = KmvK): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(labelCol).cast("string"),
        hash32(col(keyCol).cast("string")))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new graft.functions.BottomKDistinctAgg(k).toColumn.name("hashes"))
      .toDF("lab", "hashes")
  }

  // ── Count-Min sketch ───────────────────────────────────────────────────

  /** Depth (independent hash rows) and width (buckets per row). 4×512
    * longs = 16 KB of state for any input size; overestimate-only error
    * ≤ 2N/w with probability 1 - 2^-4. */
  val CmsDepth = 4
  val CmsWidth = 512

  /** The Count-Min hash family: row r maps key-hash x to
    * ((a_r·x + b_r) mod P) mod width — the SAME (a,b) constants the
    * MinHash permutations use, shared with the oracle. */
  def cmsConstants: Seq[(Int, Long, Long)] = permConstants(CmsDepth)

  /** Count-Min frequency estimates for the top-`k` true heavy hitters of
    * `keyCol`: `(key, n_true, n_est, overcount)`, ordered by true count.
    *
    * The sketch build is ONE groupBy over (row, bucket) — at most
    * 4×512 = 2048 groups, fully map-side combinable: the classic
    * "frequency table without the full-cardinality shuffle". The true
    * counts are computed only as the evaluation yardstick; `n_est ≥
    * n_true` always (Count-Min never undercounts), and the spec asserts
    * it. */
  /** The Count-Min register table `(r, bucket, c)` — ≤ depth×width = 2048
    * counter rows at any input size, one map-side-combinable groupBy.
    * Shared by [[cmsTopK]] and the streaming twin
    * ([[graft.streaming.StreamingOps.cmsRegistersStream]]). NULL keys are
    * filtered (`count(col)` semantics; their NULL hash would pool into
    * unprobeable NULL-bucket rows anyway).
    *
    * DELIVERY CONTRACT (unlike the HLL max / KMV bottom-k registers):
    * counters are sums, NOT idempotent under replay — re-delivered rows
    * add their increments again. Batch recomputation and Structured
    * Streaming state (checkpointed source offsets process each record's
    * state update exactly once) both satisfy the contract; an ingestion
    * layer that re-EMITS rows as new records inflates the affected
    * counters by exactly the re-emitted increments (estimates stay
    * overestimates — CMS never undercounts — but the e-bound degrades;
    * CmsStreamSpec proves both the exactly-once equality and this exact
    * divergence). */
  def cmsRegisters(df: DataFrame, keyCol: String): DataFrame = {
    // hash ONCE per row in its own projection, then derive the 4 register
    // coordinates from the hashed column: inlining the md5-derived hash
    // into each of the `CmsDepth` struct terms re-evaluates it per
    // register row unless codegen's subexpression elimination happens to
    // fire — at sf0.1 the 4× md5 was the query's whole wall-clock
    // (structural guarantee beats an optimizer maybe)
    val hashed = df.filter(col(keyCol).isNotNull)
      .select(hash32(col(keyCol).cast("string")).as("__h"))
    val rowBuckets = array(cmsConstants.map { case (r, a, b) =>
      struct(lit(r).as("r"),
        ((col("__h") * a + b) % P % CmsWidth).as("bucket"))
    }: _*)
    hashed
      .select(explode(rowBuckets).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  def cmsTopK(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val sketch = cmsRegisters(df, keyCol)
    val truth = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("key"))
      .limit(k)
    val probes = truth
      .withColumn("h", hash32(col("key").cast("string")))
      .select(col("key"), col("n_true"), explode(array(cmsConstants.map {
        case (r, a, b) => struct(lit(r).as("r"),
          ((col("h") * a + b) % P % CmsWidth).as("bucket"))
      }: _*)).as("rb"))
      .select(col("key"), col("n_true"),
        col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probes.join(sketch, Seq("r", "bucket"))
      .groupBy("key", "n_true").agg(min("c").as("n_est"))
      .select(col("key"), col("n_true"), col("n_est"),
        (col("n_est") - col("n_true")).as("overcount"))
      .orderBy(col("n_true").desc, col("key"))
  }

  /** Point-estimate CMS probes of an EXPLICIT candidate key set — the
    * pure sketch path: registers (one ≤2048-group map-side-combinable
    * aggregation) + 4 register lookups per probed key, NO exact
    * aggregation anywhere in the plan. This is how a Count-Min sketch is
    * actually consumed at scale: candidates arrive from outside (a
    * heavy-hitter candidate stream, an allowlist, a prior round's
    * survivors) and the sketch answers point queries; the full-
    * cardinality count-and-sort that [[cmsTopK]] runs as its evaluation
    * YARDSTICK is exactly the shuffle the sketch exists to avoid, so it
    * lives in the spec (`SketchesSpec` proves `n_est ≥ n_true` there),
    * not in the measured query (VERDICT r6 #7). Output:
    * (key, n_est) ordered by estimate DESC, key — top-k of the
    * candidate set by sketch estimate. */
  def cmsEstimates(
      df: DataFrame, keyCol: String, probeKeys: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sketch = cmsRegisters(df, keyCol)
    val probes = probeKeys.toDF("key")
      .withColumn("h", hash32(col("key").cast("string")))
      .select(col("key"), explode(array(cmsConstants.map {
        case (r, a, b) => struct(lit(r).as("r"),
          ((col("h") * a + b) % P % CmsWidth).as("bucket"))
      }: _*)).as("rb"))
      .select(col("key"), col("rb.r").as("r"), col("rb.bucket").as("bucket"))
    probes.join(sketch, Seq("r", "bucket"))
      .groupBy("key").agg(min("c").as("n_est"))
      .orderBy(col("n_est").desc, col("key"))
  }

  // ── Bloom-filter semi-join prefilter ───────────────────────────────────

  /** Filter size: 2^12 bits = 64 longs, and 3 hash probes per key. For a
    * ~300-key build side that is ~0.8% false positives — the "ship 512
    * bytes to every executor instead of shuffling the fact table"
    * semi-join prefilter. */
  val BloomBits = 4096
  val BloomWords: Int = BloomBits / 64
  val BloomK = 3

  def bloomConstants: Seq[(Int, Long, Long)] = permConstants(BloomK)

  /** The `BloomK` bit positions for a key-hash column. */
  private def bloomPositions(h: Column): Seq[Column] =
    bloomConstants.map { case (_, a, b) => (h * a + b) % P % BloomBits }

  /** Builds the bitset over `buildKeys` and probes `probe(probeKeyCol)`
    * with it; returns ONE row
    * `(n_probe, n_exact, n_bloom_pass, n_false_pos)` comparing the
    * prefilter against the exact LEFT SEMI join.
    *
    * 100 TB shape: the build side collapses to 64 longs broadcast as a
    * single-row cross join (Spark plans it as BroadcastNestedLoopJoin
    * over ONE row — constant cost), and the probe side tests 3 bit
    * positions per row inside whole-stage codegen. No shuffle of the
    * probe table at all; the exact semi-join here exists only to measure
    * the false-positive rate. Bloom passes are a SUPERSET of exact
    * matches by construction (no false negatives) — spec-asserted. */
  def bloomSemiJoinStats(
      probe: DataFrame, probeKeyCol: String,
      buildKeys: DataFrame, buildKeyCol: String): DataFrame = {
    val bh = hash32(col(buildKeyCol).cast("string"))
    val positions = buildKeys
      .select(explode(array(bloomPositions(bh).map(_.as("p")): _*)).as("pos"))
      .distinct()
    // 64-word bitset as one array<long> row: word = pos >> 6, mask = OR of
    // 1 << (pos & 63). map_from_entries + a sequence fill keeps absent
    // words as 0 without a driver collect.
    val bits = positions
      .groupBy(shiftright(col("pos"), 6).as("word"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))")
        .as("mask"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("mask"))))
        .as("mp"))
      .select(transform(sequence(lit(0), lit(BloomWords - 1)),
        w => coalesce(element_at(col("mp"), w), lit(0L))).as("bits"))
    val ph = hash32(col(probeKeyCol).cast("string"))
    // Per-probe position columns first, then the 3 bit tests against the
    // broadcast single-row bitset — all inside one codegen stage.
    val withPos = bloomConstants.zipWithIndex.foldLeft(
      probe.crossJoin(broadcast(bits))) { case (d, ((_, a, b), i)) =>
      d.withColumn(s"__pos$i", (ph * a + b) % P % BloomBits)
    }
    val cond = (0 until BloomK).map { i =>
      element_at(col("bits"), (shiftright(col(s"__pos$i"), 6) + 1).cast("int"))
        .bitwiseAND(expr(
          s"shiftleft(CAST(1 AS BIGINT), CAST(__pos$i % 64 AS INT))")) =!= 0L
    }.reduce(_ && _)
    val bloomPass = withPos.filter(cond)
      .select(count(lit(1)).as("n_bloom_pass"))
    val nProbe = probe.select(count(lit(1)).as("n_probe"))
    val exact = probe.join(
      buildKeys.select(col(buildKeyCol).as(probeKeyCol)).distinct(),
      Seq(probeKeyCol), "left_semi")
      .select(count(lit(1)).as("n_exact"))
    nProbe.crossJoin(exact).crossJoin(bloomPass)
      .select(col("n_probe"), col("n_exact"), col("n_bloom_pass"),
        (col("n_bloom_pass") - col("n_exact")).as("n_false_pos"))
  }

  // ── Mergeable quantile sketch ──────────────────────────────────────────

  /** MERGEABLE QUANTILE SKETCH — rank-error-bounded per-group quantiles
    * in ONE map-side-combinable pass with bounded state, the principled
    * 100 TB quantile path (the exact formulation's state grows with
    * distinct values; the histogram needs a known value range).
    *
    * Sketch = the k rows with the smallest portable hash of `rowId`
    * ([[graft.functions.BottomKByHashAgg]] — a deterministic uniform
    * sample; see there for why bottom-k-by-hash beats KLL/GK under
    * Spark's nondeterministic merge order). Finish = exact positional
    * quantiles (percentile_disc: position ceil(q·s) of the ascending
    * sample) over the ≤k sample values. Rank error vs the full group is
    * ≤ sqrt(ln(2/δ)/(2k)) with prob 1-δ (DKW); groups with ≤ k rows are
    * sampled COMPLETELY, so their quantiles are exact.
    *
    * Output: (groupCols…, q, est_value, sample_n, n_rows) — one row per
    * (group, q). Deterministic: same data ⇒ same rows on any
    * partitioning, any engine (QuantileSketchSpec), so the estimates
    * themselves pass the driver's hash gate like the other sketches.
    *
    * `rowId` must identify rows (a key, or any expression unique per
    * row): it seeds the hash. Shuffle: O(groups·k) pairs, input-size
    * independent. */
  def quantileSketchBy(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      rowId: Column, qs: Seq[Double], k: Int = 1024): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0 && q <= 1),
      "quantiles must be in (0, 1]")
    val samp = udaf(new graft.functions.BottomKByHashAgg(k))
    val base = df.select(groupCols.map(col) :+
      hash32(rowId.cast("string")).as("__h") :+
      col(valueCol).cast("double").as("__v"): _*)
    val sk = base.groupBy(groupCols.map(col): _*)
      .agg(samp(col("__h"), col("__v")).as("sample"),
        count(lit(1)).as("n_rows"))
      // ascending sample VALUES; the hash ordering only decides membership
      .select(groupCols.map(col) ++ Seq(col("n_rows"),
        array_sort(expr("transform(sample, s -> s.v)")).as("sv")): _*)
    // An empty population has no quantiles: drop empty samples BEFORE the
    // positional pick (the grouping-less aggregate of an empty input still
    // emits one row, whose element_at(sv, 0) would throw INVALID_INDEX_OF_ZERO)
    sk.filter(size(col("sv")) > 0)
      .withColumn("qq", explode(array(qs.map(lit): _*)))
      .select(groupCols.map(col) ++ Seq(
        col("qq").as("q"),
        element_at(col("sv"),
          ceil(col("qq") * size(col("sv"))).cast("int")).as("est_value"),
        size(col("sv")).cast("long").as("sample_n"),
        col("n_rows")): _*)
  }
}
