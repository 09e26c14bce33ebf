package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Positional q-gram edit-distance join: equality with the brute-force
  * levenshtein join (the filter only prunes — Gravano et al.'s count
  * bound is complete), the planted-dirt recovery guarantee, and the
  * fixture vocabulary's separation claim. */
class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val names = Seq(
    "anchor bramble cascade", "anchor bramble cascadX", // sub at tail
    "anchor brmble cascade",                            // deletion
    "dolphin ember fortress", "dolphin ember fortress", // exact dup
    "glacier harvest island", "glcier hrvest island",   // 2 deletions
    "meadow nocturne orchard", "meadow nocturne prairie") // word swap: far

  test("join equals the brute-force levenshtein join (filter only prunes)") {
    val left = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    val got = Fuzzy.qgramEditJoin(left, left, "id", "name", q = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (a, i) <- names.zipWithIndex; (b, j) <- names.zipWithIndex
      d = lev(a, b) if d <= 2
    } yield (i.toLong, j.toLong, d.toLong)).toSet
    assert(got == want)
    // the fixture exercises every distance class and a true negative
    assert(want.exists(_._3 == 0) && want.exists(_._3 == 1) &&
      want.exists(_._3 == 2))
    assert(!want.contains((7L, 8L, 1L)) &&
      lev(names(7), names(8)) > 2) // word swap stays out
  }

  test("erDirty perturbations are recovered with recall 1.0 at distance <= 1") {
    val keys = (1L to 400L).toDF("k")
    val clean = keys.select(col("k").as("id"),
      Fuzzy.erName(col("k")).as("name"))
    val dirty = keys.select(col("k").as("id"),
      Fuzzy.erDirty(Fuzzy.erName(col("k")), col("k")).as("name"))
    val pairs = Fuzzy.qgramEditJoin(clean, dirty, "id", "name", q = 3, k = 2)
      .filter(col("l_id") === col("r_id"))
      .select("l_id", "edit_dist")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs.keySet == (1L to 400L).toSet) // every key matches itself
    assert(pairs.values.forall(d => d == 0L || d == 1L))
    assert(pairs.values.exists(_ == 1L)) // some rows really were dirtied
  }

  test("ErWords: 64 words, pairwise edit distance >= 3 (the separation claim)") {
    assert(Fuzzy.ErWords.size == 64 && Fuzzy.ErWords.distinct.size == 64)
    for (a <- Fuzzy.ErWords; b <- Fuzzy.ErWords if a < b)
      assert(lev(a, b) >= 3, s"'$a' vs '$b'")
    assert(Fuzzy.ErWords.forall(w => !w.exists(_.isDigit)))
  }

  test("padded default: short strings (even empty) join exactly") {
    // lengths 0..6 straddle both the sub-q regime (no bare grams) and
    // the vacuous-threshold regime (L <= (k-1)q+1 = 4 padded) — the
    // output must STILL be the exact levenshtein join on every pair
    val short = Seq((1L, ""), (2L, "a"), (3L, "ab"), (4L, "ac"),
      (5L, "abc"), (6L, "abcd"), (7L, "abcdef"), (8L, "xyzzy"))
    val l = short.toDF("id", "name")
    val got = Fuzzy.qgramEditJoin(l, l, "id", "name", q = 3, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = (for {
      (a, sa) <- short; (b, sb) <- short
      d = lev(sa, sb) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got == want)
    // the fixture really exercises the short regime: the empty string
    // matches every string within 2 edits, including itself at 0
    assert(want.contains((1L, 1L, 0L)) && want.contains((1L, 3L, 2L)))
  }

  test("pad=false raises on strings shorter than q (no silent exclusion)") {
    val l = Seq((1L, "ab"), (2L, "abcdef")).toDF("id", "name")
    val e = intercept[Exception] {
      Fuzzy.qgramEditJoin(l, l, "id", "name", q = 3, k = 2, pad = false)
        .collect()
    }
    assert(e.getMessage.contains("shorter than q"))
    // pre-filtered long strings keep the bare construction working
    val long = l.filter(length(col("name")) >= 3)
    val got = Fuzzy.qgramEditJoin(long, long, "id", "name",
        q = 3, k = 2, pad = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 2L)))
  }

  test("both-short completeness arm: true pairs sharing ZERO grams are found") {
    // 2 substitutions destroy all three 3-grams of a 5-char string:
    // "abcde" {abc,bcd,cde} vs "aXcdY" {aXc,Xcd,cdY} share none, yet
    // lev = 2 <= k — only the length-band arm can produce this pair
    assert(lev("abcde", "aXcdY") == 2)
    val l = Seq((1L, "abcde"), (2L, "aXcdY"), (3L, "zzzzzzzzzzzz"))
      .toDF("id", "name")
    for (pad <- Seq(true, false)) {
      val got = Fuzzy.qgramEditJoin(l, l, "id", "name", q = 3, k = 2,
          pad = pad)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == Set((1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L),
        (1L, 2L, 2L), (2L, 1L, 2L)), s"pad=$pad")
    }
  }

  test("padded and bare constructions agree on a long-name corpus") {
    val left = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    def run(pad: Boolean) =
      Fuzzy.qgramEditJoin(left, left, "id", "name", q = 3, k = 2, pad = pad)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(pad = true) == run(pad = false))
  }

  // ---- segment-pair partition signature (the scale path) ------------

  test("segmentPairEditJoin equals the brute-force levenshtein join " +
      "(k = 1 and k = 2, mixed lengths incl. shorts, empties, dups)") {
    // adversarial mix: the word fixture, short strings below k+2 (the
    // band arm), boundary-straddling edits, duplicates, near-misses
    val mixed = names ++ Seq("", "a", "ab", "abc", "abcd", "abcde",
      "aXcdY",           // shares zero grams with abcde yet lev = 2
      "abcdefgh", "abXdefgh", "abdefgh", "abcdefghX", // edits per segment
      "abcdefgh",        // duplicate of a longer string
      "hgfedcba")        // reversal: far
    val l = mixed.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("id", "name")
    for (k <- Seq(1, 2)) {
      val got = Fuzzy.segmentPairEditJoin(l, l, "id", "name", k = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = (for {
        (a, i) <- mixed.zipWithIndex; (b, j) <- mixed.zipWithIndex
        d = lev(a, b) if d <= k
      } yield (i.toLong, j.toLong, d.toLong)).toSet
      assert(got == want, s"k=$k")
      assert(want.exists(_._3 == k.toLong), s"k=$k distance class present")
    }
  }

  test("segmentPairEditJoin == qgramEditJoin on the erName2 corpus " +
      "(two independent candidate schemes, one true join)") {
    val keys = (1L to 500L).toDF("k")
    val clean = keys.select(col("k").as("id"),
      Fuzzy.erName2(col("k")).as("name"))
    val dirty = keys.select(col("k").as("id"),
      Fuzzy.erDirty(Fuzzy.erName2(col("k")), col("k")).as("name"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val seg = rows(Fuzzy.segmentPairEditJoin(clean, dirty, "id", "name", k = 2))
    val gram = rows(Fuzzy.qgramEditJoin(clean, dirty, "id", "name",
      q = 3, k = 2))
    assert(seg == gram)
    // every planted perturbation is recovered (recall 1.0 on the dirt)
    assert((1L to 500L).forall(i => seg.exists(p => p._1 == i && p._2 == i)))
  }

  test("erName2: 21-char 'surname given' shape, head-heavy given, " +
      "high-entropy surname") {
    val n = 4000L
    val parts = (1L to n).toDF("k")
      .select(Fuzzy.erName2(col("k")).as("name"))
      .select(split(col("name"), " ").as("p"))
      .select(col("p").getItem(0).as("sur"), col("p").getItem(1).as("giv"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(parts.forall { case (s, g) => s.length == 15 && g.length == 5 })
    val givCounts = parts.groupBy(_._2).view.mapValues(_.size)
    // head-heavy given names: the top name is carried by far more rows
    // than a uniform draw over 2^16 ranks would allow, but is still a
    // sub-percent share (the census ballpark) — not the 64-word fixture
    val top = givCounts.values.max
    assert(top >= 8 && top <= n / 50, s"top given count $top")
    // high-entropy surnames: essentially no collisions at this n
    val surDup = parts.groupBy(_._1).count { case (_, v) => v.size > 1 }
    assert(surDup <= 2, s"surname collisions $surDup")
  }
}
