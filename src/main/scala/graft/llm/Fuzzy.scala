package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps.{hash32, hash32Sql}

/** Entity resolution: approximate STRING joins under an edit-distance
  * bound — the record-linkage primitive (matching dirty customer /
  * vendor / author names across feeds) that set-similarity dedup
  * (Jaccard over shingles) can't express, because a single character
  * typo is invisible to word-level tokens while edit distance prices it
  * exactly.
  *
  * Candidate generation is the POSITIONAL Q-GRAM COUNT FILTER of
  * Gravano et al., VLDB 2001 ("Approximate string joins in a database
  * (almost) for free"): k edits destroy at most q grams of EACH string
  * and shift later positions by ≤ k, so a true pair keeps at least
  * `len − q + 1 − k·q` of each side's positional q-grams matching
  * within a ±k position band, and the lengths differ by ≤ k. Both
  * per-side counts are thresholded (one-sided counting against
  * max(len) can false-negative when the other string is longer), and
  * every condition is relational: ONE equi-join on (gram, position)
  * with the ±k band folded INTO the key by replicating each left gram
  * at positions p−k..p+k — the join's fan-out is then the true
  * band-matched pair set itself, (2k+1)× smaller than a gram-only key
  * whose band filter runs after the blowup — one map-side-combinable
  * distinct-position count per candidate pair, one integer threshold.
  * Survivors are verified with
  * the exact Wagner–Fischer `levenshtein` both engines implement
  * identically over integer DP — so the operator's output is the TRUE
  * edit-distance join, the filter only prunes.
  *
  * Scale posture: the gram join's fan-out is governed by gram document
  * frequency (name-token distribution), never N²; the count filter is a
  * grouped aggregate on the (lid, rid) candidate key; the O(|s|·|t|)
  * verify runs once per SURVIVING candidate. No windows, no driver
  * state, no cartesian — the classic distributed set-similarity-join
  * shape with an edit-distance bound on top.
  */
object Fuzzy {

  /** Positional q-gram edit-distance join: all pairs (l, r) from
    * `left(idCol, nameCol)` × `right(idCol, nameCol)` with
    * `levenshtein(l.name, r.name) ≤ k`. Returns
    * `(l_id, r_id, edit_dist)`. Strings shorter than q yield no grams
    * and are never candidates — callers with ultra-short keys should
    * pad or lower q. */
  def qgramEditJoin(left: DataFrame, right: DataFrame,
      idCol: String, nameCol: String, q: Int = 3, k: Int = 2): DataFrame = {
    require(q >= 2 && k >= 1 && k <= q, s"need q >= 2, 1 <= k <= q")
    def grams(df: DataFrame, p: String): DataFrame = df
      // length < q produces no grams in either engine (Spark's sequence
      // would otherwise run DESCENDING on a negative span)
      .filter(length(col(nameCol)) >= q)
      // parallelism floor: the inputs are BYTE-tiny relations (names),
      // so AQE broadcasts one side and the join would otherwise run in
      // the other side's raw scan partitioning — a single small parquet
      // file means ONE task grinding the entire gram-match output (at
      // real scale inputs arrive in many partitions and this repartition
      // is a no-op-cost shuffle of the small name relation)
      .repartition(col(idCol))
      .select(col(idCol).as(s"${p}id"), col(nameCol).as(s"${p}nm"),
        length(col(nameCol)).cast("long").as(s"${p}len"))
      .withColumn("__x", explode(expr(
        s"transform(sequence(1, char_length(${p}nm) - ${q - 1}), " +
          s"i -> struct(substr(${p}nm, i, $q) AS g, CAST(i AS BIGINT) AS p))")))
      .select(col(s"${p}id"), col(s"${p}nm"), col(s"${p}len"),
        col("__x.g").as(s"${p}g"), col("__x.p").as(s"${p}p"))
    // the ±k position band is part of the EQUI-KEY, not a post-join
    // residual: the left grams replicate at positions p−k..p+k and the
    // join matches (gram, position) exactly — so the join's fan-out is
    // the true band-matched pair set, (2k+1)× smaller than a gram-only
    // key whose residual filter runs after the blowup. Each true
    // (lp, rp) pair matches exactly once (δ = rp − lp is unique), so
    // the distinct-position counts are unaffected.
    val lg = grams(left, "l")
      .withColumn("__d", explode(array((-k to k).map(lit(_)): _*)))
      .withColumn("ljp", col("lp") + col("__d"))
      .drop("__d")
    val rg = grams(right, "r")
    // completeness: k edits leave ≥ len − q + 1 − k·q grams of EACH
    // side untouched, and an untouched gram band-matches — so both
    // distinct-position counts must clear their own side's bound
    // (thresholding only one side against max(len) can false-negative
    // when the other string is longer)
    val cand = lg.join(rg,
        col("lg") === col("rg") &&
          col("ljp") === col("rp") &&
          abs(col("llen") - col("rlen")) <= k)
      .groupBy("lid", "rid", "lnm", "rnm", "llen", "rlen")
      .agg(countDistinct(col("lp")).as("__lhits"),
        countDistinct(col("rp")).as("__rhits"))
      .filter(col("__lhits") >= col("llen") - (q - 1) - k * q &&
        col("__rhits") >= col("rlen") - (q - 1) - k * q)
    cand
      .withColumn("edit_dist", levenshtein(col("lnm"), col("rnm")))
      .filter(col("edit_dist") <= k)
      .select(col("lid").as("l_id"), col("rid").as("r_id"),
        col("edit_dist").cast("long").as("edit_dist"))
  }

  /** The DuckDB twin of [[qgramEditJoin]] as a WITH-clause body over
    * caller-supplied relations `lrel`/`rrel` (columns `id`, `name`) —
    * the same grams, band join, count filter and levenshtein verify.
    * The final CTE `er_out` yields `(l_id, r_id, edit_dist)`. */
  def qgramEditJoinSql(lrel: String, rrel: String,
      q: Int = 3, k: Int = 2): String = {
    def grams(rel: String, p: String) =
      s"""${p}grams AS (
         |  SELECT id AS ${p}id, name AS ${p}nm, len(name)::BIGINT AS ${p}len,
         |         x.g AS ${p}gr, x.p AS ${p}p
         |  FROM $rel, LATERAL (
         |    SELECT unnest(list_transform(range(1, len(name) - ${q - 2}),
         |      i -> struct_pack(g := substr(name, CAST(i AS INT), $q),
         |                       p := i::BIGINT))) AS x) t)""".stripMargin
    s"""${grams(lrel, "l")},
       |${grams(rrel, "r")},
       |cand AS (
       |  SELECT lid, rid, lnm, rnm, llen, rlen,
       |         count(DISTINCT lp) AS lhits, count(DISTINCT rp) AS rhits
       |  FROM lgrams JOIN rgrams ON lgr = rgr
       |    AND abs(lp - rp) <= $k AND abs(llen - rlen) <= $k
       |  GROUP BY 1, 2, 3, 4, 5, 6
       |  HAVING count(DISTINCT lp) >= llen - ${q - 1} - ${k * q}
       |     AND count(DISTINCT rp) >= rlen - ${q - 1} - ${k * q}),
       |er_out AS (
       |  SELECT lid AS l_id, rid AS r_id,
       |         levenshtein(lnm, rnm)::BIGINT AS edit_dist
       |  FROM cand WHERE levenshtein(lnm, rnm) <= $k)""".stripMargin
  }

  /** The 64-word fixture vocabulary for the entity-resolution query —
    * pairwise edit distance ≥ 3 (verified at generation), so two
    * 3-word names differing in ANY word slot are > k = 2 apart and the
    * only true matches are a name and its perturbations (or an exact
    * 1-in-64³ name collision). Shared verbatim with the oracle. */
  val ErWords: IndexedSeq[String] = IndexedSeq(
    "anchor", "bramble", "cascade", "dolphin", "ember", "fortress",
    "glacier", "harvest", "island", "jasmine", "kernel", "lantern",
    "meadow", "nocturne", "orchard", "pavilion", "quarry", "rampart",
    "saffron", "umbrella", "vortex", "walnut", "xylophone", "yonder",
    "zephyr", "basilica", "cobalt", "drizzle", "enclave", "foxglove",
    "granite", "hemlock", "ivory", "juniper", "kestrel", "lagoon",
    "marble", "nimbus", "obsidian", "parchment", "quiver", "russet",
    "sterling", "thistle", "velvet", "wisteria", "yarrow", "zucchini",
    "almond", "breeze", "crimson", "flint", "grove", "harbor", "inlet",
    "jigsaw", "knoll", "ledger", "mosaic", "nutmeg", "prairie",
    "sycamore", "topaz", "waterfall")

  /** Deterministic 3-word entity name for a key — word i picked by
    * `hash32("ern" i ":" key) % 64` from [[ErWords]]. */
  def erName(key: Column): Column = {
    val arr = array(ErWords.map(lit(_)): _*)
    def w(i: Int) = element_at(arr,
      (pmod(hash32(concat(lit(s"ern$i:"), key.cast("string"))), lit(64L))
        + 1L).cast("int"))
    concat_ws(" ", w(1), w(2), w(3))
  }

  /** The DuckDB twin of [[erName]]. */
  def erNameSql(keySql: String): String = {
    val arr = ErWords.map(w => s"'$w'").mkString("[", ", ", "]")
    def w(i: Int) =
      s"$arr[CAST(${hash32Sql(s"'ern$i:' || CAST($keySql AS VARCHAR)")} " +
        s"% 64 + 1 AS INT)]"
    s"(${w(1)} || ' ' || ${w(2)} || ' ' || ${w(3)})"
  }

  /** Deterministic dirt: with h = hash32("erp:" key) and 0-based
    * position p = (h div 4) mod len(name) — h%4 = 0 substitutes the
    * char at p with '0' (never a no-op: [[ErWords]] contain no digits),
    * h%4 = 1 deletes it, else the name is clean. One substitution or
    * deletion ⇒ true edit distance exactly 1. */
  def erDirty(name: Column, key: Column): Column = {
    val h = hash32(concat(lit("erp:"), key.cast("string")))
    val m = pmod(h, lit(4L))
    // h < 2^32 and non-negative: shiftright(h, 2) IS h div 4
    val p = pmod(shiftright(h, 2), length(name).cast("long"))
    val pre = name.substr(lit(1), p.cast("int"))
    val post = name.substr((p + lit(2L)).cast("int"), length(name))
    when(m === 0L, concat(pre, lit("0"), post))
      .when(m === 1L, concat(pre, post))
      .otherwise(name)
  }

  /** The DuckDB twin of [[erDirty]] over a name SQL fragment. */
  def erDirtySql(nameSql: String, keySql: String): String = {
    val h = hash32Sql(s"'erp:' || CAST($keySql AS VARCHAR)")
    val p = s"((($h) // 4) % len($nameSql))"
    val pre = s"substr($nameSql, 1, CAST($p AS INT))"
    val post = s"substr($nameSql, CAST($p + 2 AS INT))"
    s"""(CASE
       |  WHEN ($h) % 4 = 0 THEN $pre || '0' || $post
       |  WHEN ($h) % 4 = 1 THEN $pre || $post
       |  ELSE $nameSql END)""".stripMargin
  }
}
