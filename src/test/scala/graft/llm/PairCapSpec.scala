package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The pair-emission budget that makes `embed_cosine_pairs` safe on a
  * dup-dense corpus (VERDICT r8 #3): the probe corpus's duplicate
  * density grows 10× per decade BY CONSTRUCTION, so the measured pair
  * set is still riding the density curve at the second decade (0.95
  * pairs/doc — far under the cap) and the row reads as superlinear.
  * This spec demonstrates the ASYMPTOTE the probe hasn't reached: on a
  * SATURATED corpus (every vector a near-dup of every other — the
  * worst case, denser than any probe decade), the capped output is
  * bounded by 64·N and grows LINEARLY when N doubles, while the
  * underlying pair set grows quadratically. The uncapped formulation
  * (`maxPairsPerDoc = 0`) is the licensed small-corpus oracle
  * yardstick, exactly like the brute-force kNN contrasts. */
class PairCapSpec extends SparkSpec {

  private def saturated(n: Int) = {
    import spark.implicits._
    // n tiny jitters of one base direction: every pairwise cosine ≈ 1,
    // so ALL n(n−1)/2 pairs clear tau — maximal dup density
    (0 until n).map { i =>
      val v = Array.tabulate(64)(d =>
        1.0f + 0.001f * (((i * 131 + d * 17) % 97) / 97.0f))
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("pair cap: 64·N ceiling binds on a saturated corpus; doubling " +
    "density grows output linearly, not quadratically") {
    val n1 = 300
    val n2 = 600
    // bucketless: the saturated corpus sits at LSH plane boundaries, so
    // bucket splits would blur the exact pair arithmetic — the claim
    // under test is the CAP's bound, which applies after any candidate
    // generation (the bucketed default can only produce fewer pairs)
    def capped(n: Int): Long =
      Similarity.cosinePairs(saturated(n), "vec_id", "embedding",
        tau = 0.4, bucketless = true, nPlanes = 4, dim = 64).count()
    def uncapped(n: Int): Long =
      Similarity.cosinePairs(saturated(n), "vec_id", "embedding",
        tau = 0.4, bucketless = true, nPlanes = 4, dim = 64,
        maxPairsPerDoc = 0).count()
    val (c1, c2) = (capped(n1), capped(n2))
    val u1 = uncapped(n1)
    // the saturated corpus really is all-pairs before the cap
    assert(u1 == n1.toLong * (n1 - 1) / 2, s"expected all pairs, got $u1")
    // the budget binds: ≤ 64·N at both sizes
    assert(c1 <= 64L * n1, s"cap must bound output: $c1 > 64*$n1")
    assert(c2 <= 64L * n2, s"cap must bound output: $c2 > 64*$n2")
    // and output growth is ~linear in N (quadratic would be ×4)
    assert(c2.toDouble / c1 <= 2.5,
      s"capped output must grow linearly: $c1 -> $c2")
  }

  test("sparse kNN stop-term prune: equals full semantics with the " +
    "high-df term stripped; identity when nothing crosses") {
    import spark.implicits._
    // "common" sits in 6 of 8 docs (df = 0.75N — kept by full
    // semantics, dropped at maxDfFraction = 0.5); the rest are rare
    val docs = Seq(
      (1L, "common apple banana"), (2L, "common apple cherry"),
      (3L, "common banana date"), (4L, "common cherry date"),
      (5L, "common apple date"), (6L, "common banana cherry"),
      (7L, "fig grape apple"), (8L, "fig grape banana"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame, mdf: Double) =
      Similarity.sparseTfidfKnn(d, "doc_id", "text",
        queryPred = col("doc_id") <= 2, k = 3, maxDfFraction = mdf)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getInt(2), r.getDouble(3))).toSet
    val pruned = run(docs, 0.5)
    val stripped = docs.select(col("doc_id"),
      regexp_replace(col("text"), "common ?", "").as("text"))
    assert(pruned == run(stripped, 1.0),
      "pruned semantics must equal full semantics on the stripped corpus")
    // identity: no term crosses 0.5 in the stripped corpus
    assert(run(stripped, 0.5) == run(stripped, 1.0))
    // and the prune changes the dense result (the head term mattered)
    assert(pruned != run(docs, 1.0))
  }

  test("sharedItemPairs hot-item gate: a planted ubiquitous frame blows " +
    "up the uncapped join quadratically; the df gate restores the " +
    "stripped-corpus semantics and logs the drop") {
    import spark.implicits._
    // 100 docs in families of 4: members share 3 family frames (the real
    // near-dup signal), carry 2 unique frames, and EVERY doc contains
    // the same two ubiquitous frames (black frame + station ident — the
    // 100 TB scale killer VERDICT r11 flagged: df = N ⇒ N² candidate
    // rows from those two posting lists alone)
    val n = 100
    val items = (0 until n).flatMap { id =>
      (Seq("black_frame", "station_ident") ++
        (0 until 3).map(j => s"fam${id / 4}_$j") ++
        (0 until 2).map(j => s"uniq${id}_$j"))
        .map(item => (id.toLong, item))
    }.toDF("doc_id", "frame_md5")
    def run(df: org.apache.spark.sql.DataFrame, mdf: Double,
        onDrop: (Long, Long) => Unit = (_, _) => ()) =
      Dedup.sharedItemPairs(df, "doc_id", "frame_md5", nDocs = n,
        sharedCol = "shared", maxDfFraction = mdf, onDrop = onDrop)
    // UNCAPPED: the two ubiquitous frames alone connect every doc pair
    // (shared ≥ 2) — all N(N−1)/2 pairs, the measurable quadratic blowup
    val uncapped = run(items, 1.0).count()
    assert(uncapped == n.toLong * (n - 1) / 2,
      s"expected all-pairs blowup without the gate, got $uncapped")
    // CAPPED at the 0.5 default: both hot frames dropped (df = 100 > 50),
    // drop observable, and the result EQUALS the pair graph of the
    // corpus with the ubiquitous frames stripped — family pairs only
    var dropped = Option.empty[(Long, Long)]
    val capped = run(items, 0.5, (nh, cap) => dropped = Some((nh, cap)))
      .select("id_a", "id_b", "shared").as[(Long, Long, Long)]
      .collect().toSet
    assert(dropped.contains((2L, 50L)),
      s"expected 2 hot frames dropped at cap 50, got $dropped")
    val stripped = items.filter(
      !col("frame_md5").isin("black_frame", "station_ident"))
    val expected = run(stripped, 1.0)
      .select("id_a", "id_b", "shared").as[(Long, Long, Long)]
      .collect().toSet
    assert(capped == expected,
      "gated semantics must equal full semantics on the stripped corpus")
    // structure check: 25 families × C(4,2) edges, all with shared = 3
    assert(capped.size == 150 && capped.forall(_._3 == 3L))
  }

  test("sharedItemPairs hot-set broadcast is MEASURED-count conditional: " +
    "over the cap the hint is omitted (AQE sizes the anti-join) and the " +
    "pair graph is unchanged") {
    // VERDICT r17 #7: the hot set's size bound is items-per-doc /
    // maxDfFraction — a DATA quantity (a long video contributes
    // thousands of frame hashes), not a structural constant, so an
    // unconditional broadcast(hot) was the same class of driver cliff
    // as the deleted drop-losers hints. The gate is the exact nHot count
    // the drop report already collects: under the cap the hint stays
    // (bounded driver state by measurement), over it the hint must be
    // GONE from the logical plan while results are identical.
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.LeftAnti
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    val items = (0 until 12).flatMap { id =>
      (Seq("hot_a", "hot_b") ++ (0 until 3).map(j => s"fam${id / 4}_$j"))
        .map(item => (id.toLong, item))
    }.toDF("doc_id", "frame_md5")
    def run(cap: Long) =
      Dedup.sharedItemPairs(items, "doc_id", "frame_md5", nDocs = 12,
        sharedCol = "shared", maxDfFraction = 0.5, hotBroadcastCap = cap)
    def hintedAnti(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: Join if j.joinType == LeftAnti &&
            (j.hint.rightHint.exists(_.strategy.contains(BROADCAST)) ||
             j.hint.leftHint.exists(_.strategy.contains(BROADCAST))) => j
      }.size
    val under = run(Dedup.HotBroadcastCap) // nHot = 2 ≤ cap: hint present
    val over = run(1L)                     // nHot = 2 > 1: hint omitted
    // `kept` feeds BOTH sides of the pair self-join, so the hinted
    // anti-join subtree appears twice in the logical plan
    assert(hintedAnti(under) == 2,
      "expected the conditional broadcast hint under the cap")
    assert(hintedAnti(over) == 0,
      "expected NO broadcast hint once nHot exceeds the cap")
    val a = under.select("id_a", "id_b", "shared")
      .as[(Long, Long, Long)].collect().toSet
    val b = over.select("id_a", "id_b", "shared")
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty,
      "hint presence must never change the pair graph")
  }

  test("sharedItemPairs is caller-discipline-proof: duplicated (doc, " +
    "item) rows change neither the df gate nor the shared counts") {
    import spark.implicits._
    // 8 docs in 2 families sharing 3 frames each; "hot" sits in all 8
    // docs (df 8 > cap 4 — must drop). The dirty variant repeats every
    // row 3× — a raw row count would see df 24 and triple the shared
    // counts; distinct-doc semantics must be unchanged.
    val clean = (0 until 8).flatMap { id =>
      (Seq("hot") ++ (0 until 3).map(j => s"fam${id / 4}_$j"))
        .map(item => (id.toLong, item))
    }.toDF("doc_id", "frame_md5")
    val dirty = clean.union(clean).union(clean)
    def run(df: org.apache.spark.sql.DataFrame) = {
      var drop = Option.empty[(Long, Long)]
      val out = Dedup.sharedItemPairs(df, "doc_id", "frame_md5", nDocs = 8,
          sharedCol = "shared", onDrop = (nh, cap) => drop = Some((nh, cap)))
        .select("id_a", "id_b", "shared").as[(Long, Long, Long)]
        .collect().toSet
      (out, drop)
    }
    val (cleanOut, cleanDrop) = run(clean)
    val (dirtyOut, dirtyDrop) = run(dirty)
    assert(cleanDrop.contains((1L, 4L)) && dirtyDrop == cleanDrop,
      s"df must be distinct-doc frequency: $cleanDrop vs $dirtyDrop")
    assert(dirtyOut == cleanOut,
      "duplicated input rows must not change the pair graph")
    assert(cleanOut.size == 2 * 6 && cleanOut.forall(_._3 == 3L))
  }

  test("pair cap keeps each doc's strongest edges (cluster connectivity)") {
    import spark.implicits._
    // two saturated cliques far apart: the cap must never emit a
    // cross-clique pair, and every doc must keep at least one edge
    // inside its own clique so downstream CC still finds both clusters
    val a = (0 until 80).map { i =>
      (i.toLong, Array.tabulate(64)(d =>
        1.0f + 0.001f * ((i * 31 + d) % 53)))
    }
    val b = (0 until 80).map { i =>
      ((1000 + i).toLong, Array.tabulate(64)(d =>
        (if (d % 2 == 0) -1.0f else 1.0f) + 0.001f * ((i * 37 + d) % 59)))
    }
    val pairs = Similarity.cosinePairs((a ++ b).toDF("vec_id", "embedding"),
      "vec_id", "embedding", tau = 0.4, nPlanes = 4, dim = 64,
      maxPairsPerDoc = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (x, y) => (x < 1000) == (y < 1000) },
      "no cross-clique pair may survive the tau filter")
    val touched = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert((0 until 80).forall(i => touched(i.toLong)),
      "every clique-A doc keeps an edge under the cap")
    assert((0 until 80).forall(i => touched(1000L + i)),
      "every clique-B doc keeps an edge under the cap")
  }
}
