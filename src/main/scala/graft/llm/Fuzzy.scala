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
    * `(l_id, r_id, edit_dist)`.
    *
    * `pad = true` (the default) is Gravano's full construction: each
    * name is extended with q−1 begin sentinels (U+0001) and q−1 end
    * sentinels (U+0002) before gram extraction, so a length-L string
    * yields L + q − 1 positional grams and EVERY string — down to the
    * empty string — is joinable; the count threshold becomes
    * `(L + q − 1) − k·q`. With `pad = false` (the bare construction,
    * q-gram counts `L − q + 1`) a string shorter than q has NO grams
    * and could never match — that regime now RAISES (a per-row guard
    * folded into the gram pipeline, no extra pass) instead of silently
    * false-negativing; callers who want sub-q strings dropped should
    * pre-filter explicitly.
    *
    * Ultra-short regime: the count bound guarantees a true pair shares
    * ≥ `L + q − 1 − k·q` grams (padded; `L − q + 1 − k·q` bare), which
    * is ≤ 0 — guaranteeing NOTHING, k edits can destroy every gram —
    * for `L ≤ B` where B = k·q − q + 1 padded / k·q + q − 1 bare. A
    * true pair needs only ONE side above B (that side's own bound then
    * forces ≥ 1 shared gram), so completeness needs a separate arm
    * exactly for BOTH-short pairs: a length-band join (±k folded into
    * the equi-key like the position band) over the ≤ B subset, disjoint
    * from the gram arm by construction (gram candidates with both sides
    * ≤ B are filtered out, so no dedup shuffle). That arm is
    * near-quadratic WITHIN the ultra-short subset — semantically forced
    * (at L ≤ k·q most same-length pairs ARE within k edits); for
    * short-code corpora lower q or pre-block on an exact prefix.
    * Sentinel collision caveat: names containing the control
    * characters U+0001/U+0002 would alias the sentinels — out of
    * alphabet for any real name corpus. */
  def qgramEditJoin(left: DataFrame, right: DataFrame,
      idCol: String, nameCol: String, q: Int = 3, k: Int = 2,
      pad: Boolean = true): DataFrame = {
    require(q >= 2 && k >= 1 && k <= q, s"need q >= 2, 1 <= k <= q")
    // gram count of a length-L name: L + q − 1 padded, L − q + 1 bare —
    // the count-filter threshold subtracts k·q destroyed grams from it
    val gramBase = if (pad) (q - 1).toLong else (1 - q).toLong
    def grams(df: DataFrame, p: String): DataFrame = {
      val nm = col(nameCol)
      val gsrc =
        if (pad) concat(lit("\u0001" * (q - 1)), nm, lit("\u0002" * (q - 1)))
        // bare construction: length < q would produce no grams in either
        // engine (Spark's sequence would otherwise run DESCENDING on a
        // negative span) — fail loudly instead of silently excluding;
        // the guard rides the gram-source column so it costs no extra
        // pass and cannot be pruned (the column is always consumed)
        else when(length(nm) < q, raise_error(concat(
            lit(s"qgramEditJoin: string shorter than q=$q with " +
              "pad=false (would be silently unmatchable): '"),
            nm, lit("'")))).otherwise(nm)
      df
        // parallelism floor: the inputs are BYTE-tiny relations (names),
        // so AQE broadcasts one side and the join would otherwise run in
        // the other side's raw scan partitioning — a single small parquet
        // file means ONE task grinding the entire gram-match output (at
        // real scale inputs arrive in many partitions and this repartition
        // is a no-op-cost shuffle of the small name relation)
        .repartition(col(idCol))
        .select(col(idCol).as(s"${p}id"), nm.as(s"${p}nm"),
          length(nm).cast("long").as(s"${p}len"), gsrc.as(s"${p}gs"))
        .withColumn("__x", explode(expr(
          s"transform(sequence(1, char_length(${p}gs) - ${q - 1}), " +
            s"i -> struct(substr(${p}gs, i, $q) AS g, CAST(i AS BIGINT) AS p))")))
        .select(col(s"${p}id"), col(s"${p}nm"), col(s"${p}len"),
          col("__x.g").as(s"${p}g"), col("__x.p").as(s"${p}p"))
    }
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
    // the length bound below which a side's own count bound guarantees
    // zero shared grams for a true pair (see scaladoc): pairs with BOTH
    // sides <= B route through the length-band completeness arm instead
    val B = (k * q - gramBase).toLong
    val gramCand = lg.join(rg,
        col("lg") === col("rg") &&
          col("ljp") === col("rp") &&
          abs(col("llen") - col("rlen")) <= k)
      .groupBy("lid", "rid", "lnm", "rnm", "llen", "rlen")
      .agg(countDistinct(col("lp")).as("__lhits"),
        countDistinct(col("rp")).as("__rhits"))
      .filter(col("__lhits") >= col("llen") + gramBase - k * q &&
        col("__rhits") >= col("rlen") + gramBase - k * q)
      .filter(!(col("llen") <= B && col("rlen") <= B))
      .select("lid", "rid", "lnm", "rnm", "llen", "rlen")
    // BOTH-short completeness arm: every (<= B, <= B) pair within the
    // ±k length band is a candidate — the band rides the equi-key (left
    // rows replicate at lengths len−k..len+k), never a cartesian; the
    // two arms are disjoint by the gram arm's both-short exclusion
    def shorts(df: DataFrame, p: String) = df
      .filter(length(col(nameCol)).cast("long") <= B &&
        (if (pad) lit(true) else length(col(nameCol)) >= q))
      .repartition(col(idCol))
      .select(col(idCol).as(s"${p}id"), col(nameCol).as(s"${p}nm"),
        length(col(nameCol)).cast("long").as(s"${p}len"))
    val shortCand = shorts(left, "l")
      .withColumn("__t", explode(array((-k to k).map(lit(_)): _*)))
      .withColumn("__bl", col("llen") + col("__t"))
      .drop("__t")
      .join(shorts(right, "r"), col("__bl") === col("rlen"))
      .select("lid", "rid", "lnm", "rnm", "llen", "rlen")
    gramCand.unionByName(shortCand)
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
      q: Int = 3, k: Int = 2, pad: Boolean = true): String = {
    val gramBase = if (pad) q - 1 else 1 - q
    def grams(rel: String, p: String) = {
      val gsrc =
        if (pad) s"repeat(chr(1), ${q - 1}) || name || repeat(chr(2), ${q - 1})"
        else "name"
      s"""${p}grams AS (
         |  SELECT id AS ${p}id, name AS ${p}nm, len(name)::BIGINT AS ${p}len,
         |         x.g AS ${p}gr, x.p AS ${p}p
         |  FROM $rel, LATERAL (
         |    SELECT unnest(list_transform(range(1, len($gsrc) - ${q - 2}),
         |      i -> struct_pack(g := substr($gsrc, CAST(i AS INT), $q),
         |                       p := i::BIGINT))) AS x) t)""".stripMargin
    }
    val bB = k * q - gramBase
    val shortLenPred =
      if (pad) s"len(name) <= $bB" else s"len(name) BETWEEN $q AND $bB"
    s"""${grams(lrel, "l")},
       |${grams(rrel, "r")},
       |cand AS (
       |  SELECT lid, rid, lnm, rnm, llen, rlen
       |  FROM lgrams JOIN rgrams ON lgr = rgr
       |    AND abs(lp - rp) <= $k AND abs(llen - rlen) <= $k
       |  GROUP BY 1, 2, 3, 4, 5, 6
       |  HAVING count(DISTINCT lp) >= llen + $gramBase - ${k * q}
       |     AND count(DISTINCT rp) >= rlen + $gramBase - ${k * q}
       |     AND NOT (llen <= $bB AND rlen <= $bB)
       |  UNION ALL
       |  SELECT l.id, r.id, l.name, r.name,
       |         len(l.name)::BIGINT, len(r.name)::BIGINT
       |  FROM (SELECT * FROM $lrel WHERE $shortLenPred) l
       |  JOIN (SELECT * FROM $rrel WHERE $shortLenPred) r
       |    ON abs(len(l.name) - len(r.name)) <= $k),
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
