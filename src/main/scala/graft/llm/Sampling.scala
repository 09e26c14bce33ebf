package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextOps._

/** Deterministic sampling for training-data pipelines.
  *
  * All selection decisions are pure functions of a row's id (the portable
  * 32-bit md5 hash from [[TextOps.hash32]]), never of RNG state,
  * partitioning, or row order — so samples are REPRODUCIBLE across runs,
  * cluster sizes and engines (the DuckDB oracles re-derive the identical
  * sample), and STABLE under re-partitioning (Spark's own `df.sample` is
  * neither: it seeds per-partition). Every operator is a per-row filter
  * or a bounded per-group selection — embarrassingly parallel, no
  * collect, no global sort.
  *
  * The `seed` string salts the hash so independent samples can be drawn
  * from the same corpus (sampling by `md5(seed || id)` — disjoint seeds
  * give statistically independent picks).
  */
object Sampling {

  /** Hash of (seed, id) in [0, 2^32) — the selection key. */
  private def selKey(idCol: Column, seed: String): Column =
    hash32(concat(lit(seed), lit(":"), idCol.cast("string")))

  /** Deterministic Bernoulli sample: keep a row iff
    * hash(seed, id) < fraction · 2^32. Exact-in-expectation, reproducible,
    * and MONOTONE in `fraction`: the 10% sample is a superset of the 5%
    * sample at the same seed — the property that lets a pipeline grow a
    * training set without resampling everything. */
  def bernoulliSample(
      df: DataFrame, idCol: String, fraction: Double,
      seed: String = "graft"): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    val threshold = (fraction * 4294967296.0).toLong // fraction · 2^32
    df.filter(selKey(col(idCol), seed) < lit(threshold))
  }

  /** Exact stratified sample: the `k` rows with the smallest selection
    * hash PER GROUP (a deterministic "spot-check k docs per language"
    * quota). Ties on the hash (≈2^-32) break by id. One hash-partitioned
    * window per group — the group count bounds parallelism, and k bounds
    * the output; no global sort.
    *
    * For very hot groups at extreme scale, pre-filter with
    * [[bernoulliSample]] at a fraction comfortably above k/|group| first
    * (monotonicity makes that lossless for the top-k-by-hash selection
    * with probability 1 - ε), so the window sorts a k-ish-sized slice
    * instead of the whole group. */
  /** D4-style CLUSTER-BALANCED sampling (Tirumala et al. 2023): keep at
    * most `cap` members per embedding cluster, so over-represented
    * semantic regions (boilerplate families, template farms) can't
    * dominate the training mix — the diversification stage that runs
    * AFTER SemDeDup in the D4 pipeline, expressed over the same trained
    * k-means cell assignment the ANN/dedup operators share (`assigned`:
    * one row per (id, cell)).
    *
    * Mechanically [[stratifiedSample]] with the cluster as the stratum:
    * per-cell bounded pick by the deterministic selection hash (ties →
    * smaller id), one cell-partitioned window — parallelism is the cell
    * count (nList grows with the corpus in the trained index, so no
    * cell becomes a straggler partition), output bounded by cells·cap.
    * Same hash ⇒ composes with the other samplers and is monotone in
    * `cap`. */
  def clusterBalancedSample(
      assigned: DataFrame, idCol: String, cellCol: String, cap: Int,
      seed: String = "graft"): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(col(cellCol))
      .orderBy(selKey(col(idCol), seed), col(idCol))
    assigned.withColumn("__graft_cbr", row_number().over(w))
      .filter(col("__graft_cbr") <= cap)
      .drop("__graft_cbr")
  }

  def stratifiedSample(
      df: DataFrame, groupCol: String, idCol: String, k: Int,
      seed: String = "graft"): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(selKey(col(idCol), seed), col(idCol))
    df.withColumn("__graft_srn", row_number().over(w))
      .filter(col("__graft_srn") <= k)
      .drop("__graft_srn")
  }

  /** Deterministic exact-k uniform sample: the `k` rows with the globally
    * smallest selection hash (ties → smaller id) — the reproducible
    * stand-in for reservoir sampling, without RNG state or a pass
    * ordering dependency. Plan: one TakeOrdered (map-side per-partition
    * top-k, k-sized merge at the driver-side limit) — no global sort, no
    * window. Same-seed monotonicity: growing k only ADDS rows. */
  def uniformK(
      df: DataFrame, idCol: String, k: Int,
      seed: String = "graft"): DataFrame = {
    require(k > 0, "k must be positive")
    df.withColumn("__graft_uk", selKey(col(idCol), seed))
      .orderBy(col("__graft_uk"), col(idCol))
      .limit(k)
      .drop("__graft_uk")
  }

  /** Deterministic TRAIN/VALIDATION/TEST split — every row labeled with
    * exactly one split, leak-free BY ID (a document can never land in
    * two splits, under any partitioning, on any engine) and reproducible
    * from (seed, id) alone. Fractions are cut points on the same
    * [0, 2^32) selection key the other samplers use, so the split
    * composes with them: the train partition of a Bernoulli sample is
    * the Bernoulli sample of the train partition (different seeds ⇒
    * independent). Growing a fraction only MOVES the cut point —
    * monotone, like [[bernoulliSample]]: rows enter `train` from `val`
    * in hash order, never shuffle arbitrarily. Pure per-row projection,
    * no shuffle. */
  def trainTestSplit(
      df: DataFrame, idCol: String,
      trainFrac: Double = 0.9, valFrac: Double = 0.05,
      seed: String = "graft"): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1,
      "fractions must be non-negative and sum to at most 1")
    val tCut = (trainFrac * 4294967296.0).toLong
    val vCut = ((trainFrac + valFrac) * 4294967296.0).toLong
    val k = selKey(col(idCol), seed)
    df.withColumn("split",
      when(k < lit(tCut), lit("train"))
        .when(k < lit(vCut), lit("val"))
        .otherwise(lit("test")))
  }

  /** The DuckDB mirror of [[trainTestSplit]]'s split column (same cuts,
    * same hash). */
  def trainTestSplitSql(
      idCol: String, trainFrac: Double, valFrac: Double,
      seed: String): String = {
    val tCut = (trainFrac * 4294967296.0).toLong
    val vCut = ((trainFrac + valFrac) * 4294967296.0).toLong
    val esc = seed.replace("'", "''")
    val k = hash32Sql(s"'$esc' || ':' || CAST($idCol AS VARCHAR)")
    s"CASE WHEN $k < $tCut THEN 'train' " +
      s"WHEN $k < $vCut THEN 'val' ELSE 'test' END"
  }

  /** TOKEN-BUDGET sample: keep a deterministic subset whose token count
    * lands at ≈`budget` — how training mixtures are actually sized (by
    * tokens, not documents). Two passes, both scale-correct: (1) one
    * scalar aggregate for the corpus token total (the only driver
    * value), (2) a Bernoulli keep at fraction `budget/total`. No global
    * sort, no cumulative window — the alternative "sort by hash, take
    * until the running sum hits the budget" needs a single-partition
    * scan at exactly the corpus sizes where budgets matter. The kept
    * token count concentrates tightly around `budget` (Bernoulli over
    * many docs); same-seed monotonicity in `budget` is inherited from
    * [[bernoulliSample]]. */
  def tokenBudgetSample(
      df: DataFrame, idCol: String, tokensCol: String, budget: Long,
      seed: String = "graft"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val total = df.agg(sum(col(tokensCol).cast("long"))).head().getLong(0)
    val fraction = math.min(1.0, budget.toDouble / total)
    bernoulliSample(df, idCol, fraction, seed)
  }

  /** SEQUENCE PACKING: assign every document a position in a stream of
    * fixed-length training sequences — the concat-and-split layout
    * pretraining actually uses (documents flow across sequence
    * boundaries; `seq_idx`/`start_offset` say where each doc's tokens
    * land). Output: input row + (bucket, seq_idx, start_offset).
    *
    * Deterministic AND distributed: docs are hash-assigned to `nBuckets`
    * independent packing streams, ordered inside each by (hash, id), and
    * positioned by an exclusive running token sum — one bucket-keyed
    * window, no global sort, repartition-invariant. One stream per
    * bucket is exactly how a sharded tokenizer writes its output files.
    * All arithmetic is integer (driver-gated oracle). */
  def packSequences(
      df: DataFrame, idCol: String, tokensCol: String, seqLen: Long,
      nBuckets: Int = 256, seed: String = "graft"): DataFrame = {
    require(seqLen > 0 && nBuckets > 0, "seqLen and nBuckets must be positive")
    val key = selKey(col(idCol), seed)
    val w = Window.partitionBy(col("bucket"))
      .orderBy(key, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("bucket", pmod(key, lit(nBuckets.toLong)))
      .withColumn("__graft_cum",
        coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
      .withColumn("seq_idx", floor(col("__graft_cum") / seqLen).cast("long"))
      .withColumn("start_offset", col("__graft_cum") % seqLen)
      .drop("__graft_cum")
  }

  /** Weighted mixture of sources: label each source, Bernoulli-downsample
    * each to its weight, and union — the "mix 30% web + 70% books"
    * pipeline stage. Weights are per-source KEEP FRACTIONS (each in
    * [0,1]), applied deterministically, so the mixture is reproducible
    * row-for-row. Sources must be union-compatible by name. */
  def mixture(
      sources: Seq[(String, DataFrame, Double)], idCol: String,
      seed: String = "graft"): DataFrame = {
    require(sources.nonEmpty, "mixture needs at least one source")
    sources.map { case (name, df, frac) =>
      bernoulliSample(df, idCol, frac, s"$seed/$name")
        .withColumn("mixture_source", lit(name))
    }.reduce(_ unionByName _)
  }

  /** FRACTIONAL-EPOCH UPSAMPLING — the data-mixing semantics training
    * runs actually consume (the Pile / LLaMA / Gopher mixture tables
    * quote per-source EPOCHS like wikipedia×2.4: every document repeats
    * floor(e) times, and a uniformly-chosen e−floor(e) fraction repeats
    * once more). [[mixture]] DOWN-samples to proportions; this is the
    * complementary UP-sampling leg — together they realize an arbitrary
    * mixture row.
    *
    * Epochs are exact rationals `num/den` per group (no FP: a 2.4-epoch
    * source is (12, 5)): a row repeats `num div den` times, plus once
    * more iff `hash32(seed, id) mod den < num mod den` — the same
    * (seed, id) selection-hash discipline as every sampler here, so the
    * extra-copy pick is reproducible, engine-portable, and independent
    * of partitioning. Expected copies = num/den EXACTLY.
    *
    * Scale posture: one broadcast ≤|groups|-row epoch table, one per-row
    * `explode(sequence(...))` — output size Σ e_g·|g| with NO shuffle at
    * all (the explode is map-side); the `epoch` column (0-based copy
    * index) lets downstream shuffles or pack-sequences salt on it so
    * replicas don't co-locate. Rows of groups absent from `epochs` are
    * dropped (epoch 0/1 keeps a source unchanged). */
  def epochsUpsample(df: DataFrame, idCol: String, groupCol: String,
      epochs: Seq[(String, Long, Long)], seed: String = "graft")
      : DataFrame = {
    require(epochs.nonEmpty, "epochsUpsample needs at least one group")
    require(epochs.forall { case (_, n, d) => n >= 0 && d > 0 },
      "epochs must be non-negative rationals with positive denominators")
    // fail fast on duplicate group names: map_from_entries would raise
    // an opaque runtime DUPLICATED_MAP_KEY, and the DuckDB twin's
    // VALUES join would instead silently multiply rows — a precondition
    // both engines must reject identically
    require(epochs.map(_._1).distinct.size == epochs.size,
      s"epochsUpsample: duplicate group names in epochs: " +
        epochs.map(_._1).diff(epochs.map(_._1).distinct).distinct
          .mkString(", "))
    val et = epochs.map { case (g, n, d) =>
      struct(lit(g).as("__g"), lit(n).as("__n"), lit(d).as("__d"))
    }
    df.withColumn("__et", array(et: _*))
      .withColumn("__e", expr(
        s"element_at(map_from_entries(transform(__et, " +
          s"x -> struct(x.__g, struct(x.__n, x.__d)))), " +
          s"CAST($groupCol AS STRING))"))
      .filter(col("__e").isNotNull)
      .withColumn("__copies",
        expr("__e.__n div __e.__d") +
          when(pmod(selKey(col(idCol), seed), col("__e.__d"))
            < col("__e.__n") % col("__e.__d"), lit(1L)).otherwise(lit(0L)))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(expr("sequence(0, __copies - 1)")))
      .drop("__et", "__e", "__copies")
  }

  /** The DuckDB twin of [[epochsUpsample]] over table/CTE `table`
    * (id column `idSql`, group column `groupSql`): the same epoch
    * VALUES rows, integer copy count, hash-picked extra copy and a
    * generate_series expansion. Yields `table.*` plus `epoch`. */
  def epochsUpsampleSql(table: String, idSql: String, groupSql: String,
      epochs: Seq[(String, Long, Long)], seed: String = "graft"): String = {
    val q = seed.replace("'", "''")
    val rows = epochs.map { case (g, n, d) =>
      s"('${g.replace("'", "''")}', ${n}::BIGINT, ${d}::BIGINT)"
    }.mkString(", ")
    s"""SELECT t.*, gs.epoch
       |FROM (SELECT t0.*,
       |        (e.n // e.d)
       |          + CASE WHEN ${hash32Sql(s"'$q:' || CAST($idSql AS VARCHAR)")}
       |                   % e.d < e.n % e.d THEN 1 ELSE 0 END AS __copies
       |      FROM $table t0
       |      JOIN (VALUES $rows) e(g, n, d)
       |        ON CAST($groupSql AS VARCHAR) = e.g) t,
       |     LATERAL (SELECT unnest(range(0, t.__copies)) AS epoch) gs
       |WHERE t.__copies > 0""".stripMargin
  }

  /** The DuckDB fragment matching [[bernoulliSample]]'s predicate, for
    * oracle builders. */
  def bernoulliSql(idSql: String, fraction: Double, seed: String): String = {
    val threshold = (fraction * 4294967296.0).toLong
    // single quotes doubled — mixture derives seeds from caller-supplied
    // source names, so the literal must survive arbitrary seed strings
    val q = seed.replace("'", "''")
    s"${hash32Sql(s"'$q:' || CAST($idSql AS VARCHAR)")} < $threshold"
  }

  /** TEMPERATURE-BALANCED group sampling at α = 1/2 — the multilingual
    * mixture-flattening pass (Conneau & Lample 2019's p_l^α rebalancing,
    * the XLM/mBERT convention): downsample each group (language, source
    * domain) so kept counts are proportional to c_l^α instead of c_l,
    * lifting low-resource groups' SHARE without duplicating rows. Each
    * row of group l is kept with probability a_l = √(c_min / c_l)
    * (acceptance ∝ c_l^(α−1) normalized so the rarest group keeps
    * everything — the largest lossless flattening), decided by the same
    * (seed, id) selection hash every sampler here uses.
    *
    * α is FIXED at 1/2 by design: a_l is then one correctly-rounded
    * IEEE division of two exact integer counts, one correctly-rounded
    * `sqrt`, and one correctly-rounded multiply by 2^32 — bit-identical
    * in any IEEE-754 engine (the meanPoolFixed license). A general α
    * needs `pow`, which neither Spark nor DuckDB guarantees correctly
    * rounded, so it would desync oracles by ULPs.
    *
    * Scale shape: ONE map-side-combinable group count (output =
    * |groups| rows — broadcast back by AQE), then a pure per-row hash
    * predicate; nothing corpus-sized shuffles. Reproducible,
    * repartition-invariant, and monotone in nothing it shouldn't be:
    * a group's kept set depends only on (seed, its own count, c_min).
    * Returns the kept rows of `df` unchanged. */
  def temperatureSample(
      df: DataFrame, idCol: String, groupCol: String,
      seed: String = "graft"): DataFrame = {
    val cnt = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__c"))
    val acc = cnt.crossJoin(
        cnt.agg(min("__c").as("__cmin")))
      .select(col(groupCol),
        (sqrt(col("__cmin").cast("double") / col("__c").cast("double")) *
          lit(4294967296.0)).as("__thr"))
    df.join(acc, Seq(groupCol))
      .filter(selKey(col(idCol), seed).cast("double") < col("__thr"))
      .drop("__thr")
      .select(df.columns.map(col).toSeq: _*)
  }

  /** The DuckDB WITH-fragment + predicate matching [[temperatureSample]]
    * over a table `t` with columns `idSql` / `groupSql`: caller embeds
    * `WITH ${temperatureCtes(...)} SELECT ... FROM t JOIN acc USING
    * (group) WHERE ${temperaturePredicateSql(...)}`. Kept as two pieces
    * so oracles can project their own columns. */
  def temperatureCtesSql(table: String, groupSql: String): String =
    s"""cnt AS (SELECT $groupSql AS g, count(*) AS c FROM $table GROUP BY 1),
       |acc AS (SELECT g, sqrt((SELECT min(c) FROM cnt)::DOUBLE / c::DOUBLE)
       |               * 4294967296.0 AS thr
       |        FROM cnt)""".stripMargin

  /** Deterministic WEIGHTED Bernoulli sample: keep a row with
    * probability min(1, rate · weight) — "sample proportional to token
    * count" without RNG state: the same (seed, id) selection hash the
    * other samplers use, compared against a per-row threshold. Shares
    * every sampler property: reproducible, repartition-invariant,
    * monotone in `rate` (growing the rate only ADDS rows), zero-weight
    * rows never selected, and composable with [[trainTestSplit]] /
    * [[bernoulliSample]] under disjoint seeds. Pure per-row predicate —
    * no shuffle. */
  def weightedSample(
      df: DataFrame, idCol: String, weightCol: String, rate: Double,
      seed: String = "graft"): DataFrame = {
    require(rate >= 0, "rate must be non-negative")
    // hash < rate · w · 2^32; the product chain is the same expression
    // tree the oracle states, so the per-row threshold is bit-identical
    df.filter(selKey(col(idCol), seed).cast("double") <
      lit(rate) * col(weightCol).cast("double") * lit(4294967296.0))
  }

  /** The DuckDB fragment matching [[weightedSample]]'s predicate. */
  def weightedSql(
      idSql: String, weightSql: String, rate: Double, seed: String): String = {
    val q = seed.replace("'", "''")
    s"${hash32Sql(s"'$q:' || CAST($idSql AS VARCHAR)")}::DOUBLE" +
      s" < $rate * ($weightSql)::DOUBLE * 4294967296.0"
  }

  /** DSIR-style DATA SELECTION VIA IMPORTANCE RESAMPLING (Xie et al.
    * 2023): pick the `k` raw-pool documents whose hashed-unigram
    * distribution best matches a small TARGET corpus — the standard
    * move for tilting a web-scale pool toward a domain (papers, code,
    * a benchmark's style) without training a classifier. Per document,
    * importance = Σ_tokens log p_target(f)/p_raw(f) over hashed
    * features f = hash32(token) mod `nFeatures`, with each
    * distribution add-one smoothed over its own corpus:
    * p(f) = (count(f)+1)/(total_tokens+nFeatures) — so `dsir_score`
    * is a genuine per-token mean log probability ratio, comparable
    * across corpora (an unnormalized count ratio would carry a
    * constant ln(N_raw/N_target) offset per token), and it is
    * NORMALIZED PER TOKEN (the raw sum just measures length — shorter
    * docs win on any corpus; the mean log-ratio measures fit).
    *
    * Determinism across engines: each feature's log-ratio is quantized
    * to a 1e9-scaled long (`round(ln((ct+1)·(Tr+F) / ((cr+1)·(Tt+F)))
    * ·1e9)` with the products formed in exact BIGINT arithmetic — the
    * text_lm_score treatment: one engine-local ln of one correctly-
    * rounded double division, then a round that absorbs sub-quantum
    * ulp differences), the per-doc sum is a commutative long sum, and
    * the final score is ONE correctly-rounded division of exact
    * operands rounded to 6dp. Selection = top-k by (score DESC,
    * id ASC) — total order, no RNG.
    *
    * Scale shape: two token-explode aggregations (map-side combinable;
    * output ≤ `nFeatures` rows each), the weight table BROADCASTS
    * (structurally ≤ `nFeatures` rows — that is the point of feature
    * hashing), one per-doc sum, and a distributed TakeOrdered for the
    * top-k — no global sort, no window, nothing corpus-sized moves
    * except the token relation's own aggregation. */
  def dsirSelect(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, nFeatures: Int = 1024, k: Int = 50): DataFrame = {
    require(nFeatures > 0 && k > 0, "need positive nFeatures and k")
    def tok(df: DataFrame) = df
      .select(col(idCol).as("__id"),
        explode(words(col(textCol))).as("__t"))
      .select(col("__id"),
        pmod(hash32(col("__t")), lit(nFeatures.toLong)).as("__f"))
    val rawTok = tok(raw)
    val tgtCnt = tok(target).groupBy("__f").agg(count(lit(1)).as("__ct"))
    // Per-feature counts of BOTH corpora, collected once: ≤ 2·nFeatures
    // rows by construction (that is the point of feature hashing) — the
    // same bounded-driver-state license as the centroid/median training
    // collects. Totals and the smoothed log-probability-ratio weights
    // are derived here so the token relation is scanned exactly twice
    // (once per corpus for counts, once for scoring), never a third
    // time for the totals.
    val ft = rawTok.groupBy("__f").agg(count(lit(1)).as("__cr"))
      .join(tgtCnt, Seq("__f"), "full_outer")
      .select(col("__f"), coalesce(col("__cr"), lit(0L)).as("__cr"),
        coalesce(col("__ct"), lit(0L)).as("__ct"))
      .collect()
    val tr = ft.map(_.getLong(1)).sum // total raw tokens
    val tt = ft.map(_.getLong(2)).sum // total target tokens
    val nf = nFeatures.toLong
    // ln(p_target(f)/p_raw(f)) with p(f) = (count+1)/(total+nFeatures):
    // exact BIGINT products, two IEEE long→double conversions, one
    // correctly-rounded division, one engine-local ln quantized at 1e9
    val wtRows = ft.toSeq.filter(_.getLong(1) > 0L).map { r =>
      val (cr, ct) = (r.getLong(1), r.getLong(2))
      val ratio = ((ct + 1L) * (tr + nf)).toDouble /
        ((cr + 1L) * (tt + nf)).toDouble
      (r.getLong(0), math.round(math.log(ratio) * 1e9))
    }
    val spark = raw.sparkSession
    import spark.implicits._
    val wt = wtRows.toDF("__f", "__wt")
    rawTok.join(broadcast(wt), Seq("__f"))
      .groupBy("__id")
      .agg(sum("__wt").as("__sum"), count(lit(1)).as("__n"))
      .select(col("__id"),
        round(col("__sum").cast("double") / col("__n") / lit(1e9), 6)
          .as("dsir_score"),
        col("__n").as("n_tok"))
      .orderBy(col("dsir_score").desc, col("__id").asc)
      .limit(k)
      .select(col("__id").as(idCol), col("dsir_score"), col("n_tok"))
  }

  /** PER-GROUP QUANTILE BUCKETING — the CCNet split (Wenzek et al.
    * 2020): each group's rows are ranked by an integral score and cut
    * into `nBuckets` equal-count buckets (head/middle/tail for
    * `nBuckets` = 3 over a perplexity score, per language). Bucket `b`'s
    * upper cutoff is the smallest score whose cumulative count reaches
    * `ceil(b·n/nBuckets)` (quantile-disc — an actual data value, exact
    * integer rank arithmetic in both engines; never interpolated FP).
    * A row's bucket = 1 + #cutoffs strictly below its score, so
    * coincident cutoffs (degenerate distributions) resolve identically
    * everywhere.
    *
    * Scale shape: the x_quantiles two-level mechanism — distinct
    * (group, score) counts, then windows partitioned by (group, BIN)
    * with bin = score div `binWidth`, so every sort partition is
    * bounded by the VALUE TICKS inside one bin (a resolution constant),
    * never by group row count; bin offsets come from a per-group
    * window over bin counts (rows = bins, also resolution-bounded).
    * The cutoff table (groups × (nBuckets−1) rows) broadcasts; bucket
    * assignment is one per-row array scan. No corpus-sized sort, no
    * per-group single partition.
    *
    * `df` must carry integral `scoreCol`; output appends `bucket`
    * (1-based int). */
  def bucketByGroupQuantiles(
      df: DataFrame, groupCol: String, scoreCol: String,
      nBuckets: Int, binWidth: Long): DataFrame = {
    require(nBuckets >= 2 && binWidth > 0, "need nBuckets >= 2, binWidth > 0")
    val vf = df.groupBy(col(groupCol).as("__g"), col(scoreCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__bin", expr(s"__v div $binWidth"))
    val binTot = vf.groupBy("__g", "__bin").agg(sum("__cnt").as("__bcnt"))
    val byBin = Window.partitionBy("__g").orderBy("__bin")
    val offs = binTot
      .withColumn("__off", sum("__bcnt").over(byBin) - col("__bcnt"))
      .select("__g", "__bin", "__off")
    val nPerG = binTot.groupBy("__g").agg(sum("__bcnt").as("__n"))
    val byV = Window.partitionBy("__g", "__bin").orderBy("__v")
    // pos_b = ceil(b·n/k) as EXACT integer arithmetic: (b·n + k−1) div k
    val cuts = vf.withColumn("__wcum", sum("__cnt").over(byV))
      .join(broadcast(offs), Seq("__g", "__bin"))
      .join(broadcast(nPerG), Seq("__g"))
      .withColumn("__cum", col("__off") + col("__wcum"))
      .withColumn("__b", explode(array((1 until nBuckets).map(lit(_)): _*)))
      .withColumn("__pos",
        expr(s"(__b * __n + ${nBuckets - 1}) div $nBuckets"))
      .filter(col("__cum") - col("__cnt") < col("__pos") &&
        col("__pos") <= col("__cum"))
      .select(col("__g"), col("__b"), col("__v").as("__cut"))
    val cutArr = cuts
      .groupBy("__g")
      .agg(sort_array(collect_list(struct(col("__b"), col("__cut"))))
        .as("__cs"))
      .select(col("__g"),
        expr("transform(__cs, x -> x.__cut)").as("__cuts"))
    df.join(broadcast(cutArr), df(groupCol) === cutArr("__g"))
      .withColumn("bucket",
        (lit(1) + size(expr(s"filter(__cuts, c -> $scoreCol > c)")))
          .cast("int"))
      .drop("__g", "__cuts")
  }

  /** EXACT per-group order statistics at arbitrary permille ranks —
    * [[bucketByGroupQuantiles]]'s mechanism generalized from equal-count
    * bucket edges to caller-chosen ranks (winsorization bounds, p99
    * monitoring cuts): for each group g with n rows and each requested
    * permille p, the value at integer rank `(p·n + 999) div 1000`
    * (= ⌈p·n/1000⌉ — the p-th-permille order statistic, never
    * interpolated FP).
    *
    * Same two-level binned posture: a (group, value) count contraction,
    * per-bin offsets via a window whose row count is BINS per group (a
    * resolution constant set by `binWidth`, never data volume), the
    * in-bin cumulative ordered by value inside one bin only. Returns
    * `(group, permille, cut)` — |groups|·|permilles| rows. */
  def groupPermilleCuts(
      df: DataFrame, groupCol: String, scoreCol: String,
      permilles: Seq[Int], binWidth: Long): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      "permilles must be in [1, 1000]")
    require(binWidth > 0, "need binWidth > 0")
    val vf = df.groupBy(col(groupCol).as("__g"), col(scoreCol).as("__v"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__bin", expr(s"__v div $binWidth"))
    val binTot = vf.groupBy("__g", "__bin").agg(sum("__cnt").as("__bcnt"))
    val byBin = Window.partitionBy("__g").orderBy("__bin")
    val offs = binTot
      .withColumn("__off", sum("__bcnt").over(byBin) - col("__bcnt"))
      .select("__g", "__bin", "__off")
    val nPerG = binTot.groupBy("__g").agg(sum("__bcnt").as("__n"))
    val byV = Window.partitionBy("__g", "__bin").orderBy("__v")
    vf.withColumn("__wcum", sum("__cnt").over(byV))
      .join(broadcast(offs), Seq("__g", "__bin"))
      .join(broadcast(nPerG), Seq("__g"))
      .withColumn("__cum", col("__off") + col("__wcum"))
      .withColumn("permille", explode(array(permilles.map(lit(_)): _*)))
      .withColumn("__pos", expr("(permille * __n + 999) div 1000"))
      .filter(col("__cum") - col("__cnt") < col("__pos") &&
        col("__pos") <= col("__cum"))
      .select(col("__g").as("group_key"), col("permille"),
        col("__v").as("cut"))
  }
}
