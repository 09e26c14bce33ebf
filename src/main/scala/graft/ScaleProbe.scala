package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up probe (VERDICT r3 #6): synthesize a seeded ~10× corpus from
  * an existing SF dir, run the dedup/ANN family on both, and print the
  * wall-time curve — evidence (not promise) that the banded joins and
  * O(log n) connected components stay near-linear when the data grows.
  *
  * The expansion preserves the dup-rate STRUCTURE the operators exist
  * for: per original doc, one exact copy (new id), one ~10%-word-mutated
  * near-dup, and seven heavily-mutated distinct docs; per original
  * embedding, one small-jitter near neighbor and eight far points. All
  * mutations are hash-seeded — the corpus is reproducible bit-for-bit.
  *
  * Usage: runMain graft.ScaleProbe [baseSfDir] [outDir]
  * Writes parquet only under the repo-local outDir (default tmp_scale10).
  */
object ScaleProbe {

  final case class Doc(
      doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  final case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

  private def h(parts: Long*): Long = {
    // splitmix-style avalanche over the concatenated parts — cheap,
    // deterministic, well-mixed
    var x = 0x9e3779b97f4a7c15L
    parts.foreach { p =>
      x ^= p + 0x9e3779b97f4a7c15L + (x << 6) + (x >>> 2)
      x *= 0xbf58476d1ce4e5b9L; x ^= x >>> 27
    }
    x & Long.MaxValue
  }

  /** Zipf-vocabulary word for a hash draw: inverse-CDF sampling over
    * ranks 1..V with P(rank = r) ∝ 1/r — P(rank ≤ x) = ln(x)/ln(V), so
    * rank = ⌊exp(u·ln V)⌋. The base testdata's documents carry a ~31-
    * token vocabulary, which makes any postings×queries TERM join
    * degenerate quadratically (every term's df ≈ N — `VocabProbe`
    * quantifies it; the r15 standing row knn_sparse_tfidf "42×/decade"
    * measured the fixture, not the operator). The scaled probe corpora
    * therefore regenerate text over a realistic 65 536-word Zipf
    * vocabulary: common terms still exist (df(z1) ≈ N — exactly what
    * df-pruning is FOR), but the tail is heavy and term-join
    * selectivity is honest. sf0.01/sf0.001 fixtures are untouched —
    * oracles and the CORRECTNESS gate never see probe corpora. */
  private val ZipfV = 65536
  private def zipfWord(hv: Long): String = {
    val u = (hv % 1000000L).toDouble / 1000000.0
    // exp(u·lnV) ∈ [1, V) — floor gives rank ∈ [1, V−1], P(r) ∝ 1/r
    val rank = math.max(1L,
      math.exp(u * math.log(ZipfV.toDouble)).toLong)
    "z" + rank
  }

  /** Replica r of a document: the FAMILY BASE text is the original's
    * word count re-drawn from the Zipf vocabulary (seeded by the
    * family id only — every replica derives from it, so the dup-rate
    * STRUCTURE the dedup operators exist for is preserved exactly):
    * r=0 the base, r=1 exact copy, r=2 near-dup (~10% words redrawn),
    * r>=3 heavy mutation (~50% redrawn, distinct but shingle-sharing,
    * as before). */
  private def mutate(d: Doc, r: Int): Doc = {
    val nid = d.doc_id * 10 + r
    val nWords = d.text.count(_ == ' ') + 1
    def base(i: Int): String = zipfWord(h(d.doc_id, 11L, i.toLong))
    val text = (r match {
      case 0 | 1 => (0 until nWords).map(base)
      case _ =>
        val rate = if (r == 2) 10 else 2 // redraw 1-in-rate words
        (0 until nWords).map { i =>
          if (h(d.doc_id, r.toLong, i.toLong) % rate == 0)
            zipfWord(h(d.doc_id, r.toLong, i.toLong, 7L))
          else base(i)
        }
    }).mkString(" ")
    Doc(nid, text, d.lang, d.source, text.length.toLong)
  }

  final case class Ev(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Replica r of an event: same user (10× rows PER KEY — how event
    * streams actually grow), new id, ts shifted r·7s, value jittered. */
  private def shift(e: Ev, r: Int): Ev =
    e.copy(
      event_id = e.event_id * 10 + r,
      ts = new java.sql.Timestamp(e.ts.getTime + r * 7000L),
      value = e.value + (h(e.event_id, r.toLong) % 100L) / 100.0)

  private def jitter(e: Emb, r: Int): Emb = {
    val scale = if (r <= 1) 0.02f else 1.0f
    val vec = e.embedding.zipWithIndex.map { case (x, d) =>
      if (r == 0) x
      else x + scale * ((h(e.vec_id, r.toLong, d.toLong) % 1000L) / 1000.0f - 0.5f)
    }
    Emb(e.vec_id * 10 + r, vec, e.label)
  }

  /** Synthesize the seeded 10× corpus from `baseDir` into `outDir`
    * (idempotent — skipped when the parquet already exists). Shared by
    * the standalone probe main and Bench's `SPARK_GRAFT_BENCH_10X`
    * standing-artifact mode. */
  def ensureCorpus(spark: SparkSession, baseDir: String, outDir: String,
      tables: Set[String] = Set.empty): Unit = {
    import spark.implicits._
    // `tables` non-empty restricts generation to the named tables — the
    // PROBE1000 path only needs events + embeddings, and a full 1000×
    // corpus would spend minutes (and ~15 GB) writing lineitem/orders
    // nobody reads. Empty set (default) = everything.
    def wanted(t: String): Boolean = tables.isEmpty || tables.contains(t)
    if (wanted("documents") &&
        !new java.io.File(s"$outDir/documents.parquet").exists()) {
      Tables.read(spark, baseDir, "documents").as[Doc]
        .flatMap(d => (0 until 10).map(mutate(d, _)))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }
    if (wanted("embeddings") &&
        !new java.io.File(s"$outDir/embeddings.parquet").exists()) {
      Tables.read(spark, baseDir, "embeddings").as[Emb]
        .flatMap(e => (0 until 10).map(jitter(e, _)))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }
    if (wanted("events") &&
        !new java.io.File(s"$outDir/events.parquet").exists()) {
      Tables.read(spark, baseDir, "events").as[Ev]
        .flatMap(e => (0 until 10).map(shift(e, _)))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }
    // separate guard: corpora generated before the sketch family existed
    // upgrade in place instead of silently missing the TPC-H tables
    // TPC-H side for the sketch/quantile family: 10× orders and their
    // line items (new order keys, same customers and parts — key
    // cardinality on the probe side grows, dimension sides don't,
    // which is exactly the shape Bloom/CMS exist for); customers
    // copied unchanged as the constant build side. Each table gated on
    // its OWN name (ADVICE r11: SPARK_GRAFT_PROBE_TABLES=orders passed
    // validation but generated nothing while everything hid behind the
    // lineitem gate).
    if (wanted("lineitem") &&
        !new java.io.File(s"$outDir/lineitem.parquet").exists()) {
      Tables.read(spark, baseDir, "lineitem").as[Li]
        .flatMap(l => (0 until 10).map(liRep(l, _)))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    }
    if (wanted("orders") &&
        !new java.io.File(s"$outDir/orders.parquet").exists()) {
      Tables.read(spark, baseDir, "orders").as[Ord]
        .flatMap(o => (0 until 10).map(r =>
          o.copy(o_orderkey = o.o_orderkey * 10 + r)))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    }
    if (wanted("customer") &&
        !new java.io.File(s"$outDir/customer.parquet").exists()) {
      Tables.read(spark, baseDir, "customer")
        .write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    }
    // round-8 guard: the TPC-H pushdown/broadcast family reads `part`
    // (the broadcast dim — copied UNCHANGED: fact side grows, dimension
    // side doesn't, the shape broadcast joins exist for); corpora built
    // before this round upgrade in place
    if (wanted("part") &&
        !new java.io.File(s"$outDir/part.parquet").exists()) {
      Tables.read(spark, baseDir, "part")
        .write.mode("overwrite").parquet(s"$outDir/part.parquet")
    }
    // round-8 continuation guard: the subquery/semi-anti family reads
    // `supplier` (another unchanged broadcast dim); corpora built before
    // it upgrade in place
    if (wanted("supplier") &&
        !new java.io.File(s"$outDir/supplier.parquet").exists()) {
      Tables.read(spark, baseDir, "supplier")
        .write.mode("overwrite").parquet(s"$outDir/supplier.parquet")
    }
    // round-9 guard: the Q2/Q7/Q8/Q20 shapes read the `nation`/`region`
    // geography dims (tiny, broadcast, copied unchanged)
    Seq("nation", "region").foreach { t =>
      if (wanted(t) && !new java.io.File(s"$outDir/$t.parquet").exists()) {
        Tables.read(spark, baseDir, t)
          .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      }
    }
  }

  final case class Li(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.sql.Timestamp)
  final case class Ord(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.sql.Timestamp,
      o_orderpriority: String)

  /** Line-item replica: new order key, hash-jittered price (so the
    * quantile value-frequency table grows with the data instead of
    * collapsing onto the original distinct values). */
  private def liRep(l: Li, r: Int): Li = l.copy(
    l_orderkey = l.l_orderkey * 10 + r,
    l_extendedprice = l.l_extendedprice +
      (h(l.l_orderkey, l.l_linenumber.toLong, r.toLong) % 100L) / 100.0)

  /** The scale-sensitive query family the 10× probe measures: the whole
    * dedup/ANN pipeline plus the flagship as-of path at 10× event
    * density. */
  val family: Seq[String] = Seq(
    "dedup_exact", "dedup_drop_exact", "dedup_jaccard_pairs",
    "dedup_jaccard_pairs_capped", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_clusters", "dedup_drop_near", "dedup_drop_embed",
    "dedup_drop_embed_capped",
    "knn_cosine_brute", "knn_lsh_bucketed", "knn_lsh_multiprobe",
    "knn_lsh_multitable", "knn_recall_lsh", "knn_sq8", "knn_pq",
    "knn_ivf", "knn_ivfpq", "knn_ivfpq_rerank", "embed_cosine_pairs",
    "embed_cosine_pairs_capped", "embed_cosine_pairs_ivf", "text_tfidf",
    // the FLAGSHIP family at 10× event density (same key cardinality)
    "pull_latest_events", "j1_coarse_range", "pit_events_ttl1h",
    "pit_native_asof", "w1_topk_per_key",
    // sketches (state constant by construction — the ratio should be
    // pure scan growth), exact quantiles (value-frequency window grows
    // with distinct values), and the per-row text family at 10× docs
    "sketch_hll_distinct", "sketch_cms_topk", "sketch_bloom_semijoin",
    "sketch_hll_windowed", "sketch_kmv_setops", "graph_pagerank",
    "x_quantiles", "x_quantiles_approx", "x_quantiles_sketch", "x_zorder",
    "text_bm25", "text_quality_filter", "text_pii_redact",
    "text_lm_score", "dedup_pairs_against", "dedup_ingest",
    "dedup_containment_pairs", "x_rolling_window", "dedup_spans",
    "pipe_curate", "x_interval_join",
    // round-8 additions: TPC-H pushdown/broadcast shapes, SCD2 window,
    // profiling scan, native char entropy, cube — all keyed or per-row
    "x_q6_revenue", "x_q14_promo", "x_q19_disjunctive", "x_scd2_history",
    "x_profile_events", "text_entropy", "x_cube",
    // round-8 subquery/set-op family: decorrelated scalar subqueries,
    // semi/anti self-joins on l_orderkey, hash-distinct set ops, and
    // the keyed ranking-window pass — all shuffle on scaling keys
    "x_q13_custdist", "x_q15_top_supplier", "x_q17_small_qty",
    "x_q21_last_shipper", "x_q22_idle_customers", "x_setops",
    "x_window_funcs", "text_ngram_diversity",
    // sparse lexical retrieval, tokenize-encode, exact z-score outliers
    "knn_sparse_tfidf", "text_encode_ids", "x_anomaly_zscore",
    // round-9: image near-dup (decode → aHash → banded hamming join),
    // incremental-agg merge, perceptual hash scan
    "mm_image_near_dup", "mm_image_dedup", "mm_image_ahash",
    "mm_audio_near_dup", "mm_audio_dedup", "mm_video_near_dup",
    "mm_video_dedup", "x_incremental_agg",
    // round-9 TPC-H closures: correlated-min decorrelation, bilateral
    // volume (two fact shuffles), market share, HAVING-vs-global,
    // distinct-count + NOT IN, nested semi-joins
    "x_q2_min_cost", "x_q7_volume", "x_q8_market_share",
    "x_q11_important_parts", "x_q16_supplier_count",
    "x_q20_dominant_suppliers",
    "x_q9_profit", "x_q10_returned", "x_q12_late_priority",
    // round-11: the sampling family (per-row hash predicates over
    // documents — expected ~1×/decade per-row cost) and the pruned
    // sparse production path (the dense knn_sparse_tfidf row stays the
    // licensed contrast, skipped at 100×)
    "sample_bernoulli", "sample_stratified", "sample_uniform_k",
    "sample_token_budget", "sample_pack_sequences", "sample_mixture",
    "sample_split", "sample_weighted", "knn_sparse_tfidf_pruned",
    // round-11: ISO-BMFF sample-table demux dedup (the codec-agnostic
    // video dedup path — H.264/H.265 containers without pixel decode)
    "mm_mp4_near_dup", "mm_mp4_dedup",
    // round-12: web-crawl URL canonicalization family — per-row string
    // surgery + one canonical-key (resp. host-key) aggregation — and
    // host-scoped boilerplate removal (two-pass line-df prune: small
    // boiler set joined back, one per-doc groupBy reassembles)
    "web_url_canonical", "web_url_dedup", "web_host_stats",
    "web_boilerplate_strip",
    // round-13: HTML extraction (per-row regex chain), outlink → host
    // link graph (explode + one map-side-combinable groupBy; edge
    // cardinality hosts², not pages²), and integer PageRank over it
    "web_text_extract", "web_link_graph", "web_host_rank",
    // recrawl merge (one canonical-key aggregate) and snapshot diff
    // (digest-only full-outer join — keys + md5 move, never bodies)
    "web_crawl_merge", "web_crawl_delta",
    // round-13 session 2: drift monitors (one scan + (type, bin)/(type,
    // cents) map-side-combinable aggregation; the KS window runs over
    // the aggregated distinct-cents relation, bounded by value
    // cardinality) and hybrid RRF fusion (two k-bounded retrievals +
    // a ≤2k-rows-per-query fuse)
    "mon_drift_bins", "mon_drift_stats", "mon_ks_value",
    "mon_new_categories", "rag_fusion_rrf",
    // round-14: the r13 newcomers' missing scale rows (VERDICT r13 #4)
    // plus the ANN-backed fusion twin and the gated MMR re-rank — the
    // per-row chunker, the no-exemption IVF+pruned-sparse fusion path,
    // and the kCand²-bounded greedy re-rank
    "text_chunks_overlap", "rag_fusion_rrf_ivf", "rag_mmr_rerank",
    "rag_mmr_rerank_ivf",
    // round-14: the context-assembly stage completing the RAG chain —
    // IVF retrieval (cached index) + candidate-pruned tokenizer +
    // k-bounded per-query packing window
    "rag_context_pack",
    // round-14: z-order layout effectiveness — one scan, two map-side-
    // combinable 32-group aggregates, a 32-row join
    "x_zorder_layout",
    // round-15: robots filtering (host equi-join + per-URL winner agg),
    // paragraph dedup (content-keyed winner agg + join + per-doc
    // reassembly), positional phrase search (linear postings + a
    // broadcast gram equi-join), DSIR selection (two token aggregations
    // + a ≤1024-row broadcast weight join + TakeOrdered), RP-tree ANN
    // (cached median splits, leaf equi-join), compaction planning (one
    // window over the file LISTING — rows = file count)
    "web_robots_filter", "dedup_paragraphs", "text_phrase_search",
    "sample_dsir", "knn_rptree", "knn_rptree_forest",
    "knn_rptree_recall", "x_compaction_plan",
    // round-16: compaction EXECUTED (write small files, one
    // group-keyed shuffle, rewrite, verify read-back — rows = data
    // rows this time, the write path priced end-to-end), and the
    // fixed-|Q| context-pack twin (|Q| = 200 at every decade from 10×
    // up — isolates per-query cost from the %100 set's 10×/decade
    // output growth)
    "x_compaction_exec", "rag_context_pack_fixedq",
    // round-16 session 2: BPE training (8 vocab-sized weighted pair
    // aggregations + TakeOrdered(1) argmaxes) and encoding (per-row
    // 8-replace chain + per-doc sum), SemDeDup (the drop_embed pair
    // join + a broadcast centroid projection + per-cluster winner agg),
    // CCNet perplexity terciles (lm_score + the binned two-level rank
    // mechanism), frontier scheduling (per-host windows), HITS (six
    // edge equi-joins + grouped long sums over the bipartite graph)
    "text_bpe_train", "text_bpe_apply", "dedup_semdedup",
    "sample_ppl_buckets", "web_frontier_schedule", "graph_hits",
    // round-16 session 3: TrustRank (same per-round join shape as
    // pagerank + an iteration-invariant seed flag), NFC normalization
    // (pure per-row native expression — the zero-shuffle floor), and
    // conjunctive boolean search (distinct-term postings restricted by
    // the query-term equi-join + one grouped count equality)
    "graph_trustrank", "text_normalize", "text_bool_search",
    // D4 diversification: the cached cell assignment + one
    // cell-partitioned bounded window
    "sample_cluster_balanced",
    // round-16 session 4: triangle support (degree-oriented wedge join,
    // O(m^1.5) bound — host-graph edges grow linearly with the corpus),
    // linear classifier inference (token explode + nFeatures-row weight
    // join + per-doc sum), temperature rebalancing (|langs|-row count
    // aggregate + per-row hash predicate)
    "graph_triangles", "text_classifier_score", "sample_temperature",
    // round-16 session 5: PMI collocations (two token-explode counts +
    // vocabulary-keyed joins + TakeOrdered), video scene detection
    // (partition-local demux + one per-video window bounded by
    // frames-per-asset), forward as-of (user-keyed equi-join + range
    // residual + min(struct) winner)
    "text_collocations", "mm_video_scenes", "x_asof_forward",
    // champion-list sparse retrieval: per-query candidates bounded by
    // |query terms|·championC — the corpus-independent lexical probe
    "knn_sparse_tfidf_champion",
    // round-16 session 6: multi-source BFS (per-round frontier equi-join
    // + anti-join — work tracks frontier edges, not corpus), epoch
    // upsampling (broadcast epoch table + map-side explode, zero
    // shuffle), winsorization (binned exact-rank cuts + broadcast
    // clamp), OOV audit (vocab contraction + TakeOrdered(V) + broadcast
    // membership join). x_entity_resolution is deliberately NOT probed:
    // its input is the UNSCALED customer dim, and the 64-word synthetic
    // name vocabulary caps q-gram diversity, so a probe row would price
    // the fixture's degenerate gram df, not the operator (the
    // knn_sparse_tfidf / VocabProbe lesson) — real name corpora carry
    // gram diversity that grows with the data, which is what bounds the
    // Gravano filter's join fan-out.
    "graph_bfs_depth", "sample_epochs", "x_winsorize", "text_oov_rate",
    // binary-quantization rerank: 64-bit sketches, 4×16-bit banded
    // candidates (fan-out governed by band occupancy ≈ N/65536), exact
    // cosine rerank on survivors only
    "knn_binary_rerank",
    // round-17: the inverted multi-index (product cells: N^(2/3) cells
    // for N^(1/3) assignment work/row, in-cell occupancy N^(1/3) —
    // below the single-level √N floor), its recall row, and the
    // fixed-|Q| context-pack twin riding it — the r16 third-decade
    // lever priced head-to-head against rag_context_pack_fixedq
    "knn_imi", "knn_imi_recall", "rag_context_pack_imi",
    // the PQ twin: in-cell candidates scanned from 8-byte codes via the
    // pruned read, floats touched at shortlist cardinality only
    "rag_context_pack_pq",
    // production-depth BPE encode: distinct-word contraction + the
    // constant-plan-size rank-priority expression (depth ladder priced
    // separately by graft.BpeDepthProbe)
    "text_bpe_encode",
    // Aho–Corasick blocklist: one automaton pass per doc — expected
    // per-row cost flat in lexicon size, ~1×/decade per-row scan
    "text_blocklist",
    // round-17 session 2 (VERDICT r16 #5): entity resolution on the
    // realistic erName2 corpus (names derived from doc_id — head-heavy
    // Zipf given + uniform-48-bit surname, so gram diversity grows with
    // the data). x_er_names_seg is the STANDING scale row (segment-pair
    // partition signatures: candidates keyed by pairs of ~5-char
    // segments — the given-name head block is divided by surname
    // entropy, candidate count ~linear). The gram-filter contrast
    // (x_er_names_gram, gate-checked at sf0.01) is NOT standing-rowed:
    // its candidate join is alphabet-bounded-quadratic by mechanism
    // (~0.1·N² rows at 50k names — a median-3 row grinds for most of an
    // hour pricing a known exponent); graft.ErGramProbe prices both
    // schemes' candidate stages single-shot, the VocabProbe pattern.
    "x_er_names_seg",
    // corpus-vs-corpus retrieval: the NN-descent k-NN graph — O(N·k²)
    // per local-join round (candidates = neighbors-of-neighbors with
    // the reverse side capped at k), vs N × in-cell occupancy for
    // probing an inverted file with the corpus as the query batch —
    // expected ~linear per decade; and the dedup composition consuming
    // it (τ-thresholded edges → min-label components → keep-winner)
    "knn_graph", "dedup_semdedup_graph")

  /** Cold pair-graph BUILD rows (ADVICE r11 medium): the `mm_*_near_dup`
    * probe rows read the session-cached pair graph priced in their dedup
    * siblings, so the demux → hash → inverted-index join build gets its
    * own scale rows — cache evicted, then the build (including eager
    * materialization) timed. Row count = pairs in the built graph. */
  val buildFamily: Seq[String] =
    Seq("mm_video_pairs_build", "mm_mp4_pairs_build", "web_edges_build",
      "ivf_index_build", "imi_index_build", "ivfpq_index_build")

  def timeBuild(
      spark: SparkSession, name: String, dir: String): (Double, Long) = {
    graft.queries.LlmQueries.evictPairGraphs(spark)
    graft.queries.LlmQueries.evictWebEdges(spark)
    graft.queries.LlmQueries.evictAnnIndexes(spark)
    val t0 = System.nanoTime()
    val n = name match {
      case "mm_video_pairs_build" =>
        graft.queries.LlmQueries.videoPairs(spark, dir).count()
      case "mm_mp4_pairs_build" =>
        graft.queries.LlmQueries.mp4Pairs(spark, dir).count()
      case "web_edges_build" =>
        // the shared HTML link-extraction scan (round 14): the cost the
        // cache-amortized web_link_graph / web_host_rank rows no longer
        // carry per query
        graft.queries.LlmQueries.webEdges(spark, dir).count()
      case "ivf_index_build" =>
        // the full single-level inverted-file lifecycle cold: k-means
        // train (O(sample·nList·d·iters)) + corpus assignment
        // (O(N·nList·d), the N^1.5 term under the √N cell default) +
        // the cell-clustered persist — the pass every knn_ivf/rag row
        // amortizes per corpus snapshot
        graft.queries.LlmQueries.ivfIndex(spark, dir).count()
      case "ivfpq_index_build" =>
        // the composed IVF-PQ artifact cold: coarse train+assign plus
        // the PQ codebook training and the O(N·d·ksub) encode pass —
        // the 8-bytes-per-vector index the rag_context_pack_pq row
        // amortizes
        graft.queries.LlmQueries.ivfPqIndex(spark, dir).count()
      case "imi_index_build" =>
        // the multi-index lifecycle cold: two kHalf-codebook trainings
        // + the O(N·kHalf·d) product-cell assignment — the build-side
        // half of the sub-√N claim (kHalf = N^(1/3) ≪ nList = √N)
        graft.queries.LlmQueries.imiIndex(spark, dir).count()
      case other =>
        throw new IllegalArgumentException(s"unknown build probe: $other")
    }
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** Median of three cold builds ([[timeBuild]] evicts per run, so every
    * rep pays the full build — the median absorbs JIT/GC spikes only). */
  def timeBuildMedian3(
      spark: SparkSession, name: String, dir: String): (Double, Long) = {
    val runs = (1 to 3).map(_ => timeBuild(spark, name, dir))
    (runs.map(_._1).sorted.apply(1), runs.head._2)
  }

  /** Streaming-twin probe rows (r9 item #4): each runs the REAL
    * streaming operator as a parquet file-source stream over the probe
    * corpus ([[Tables.readStreamParquet]] — same NANOS repair and
    * schema as the batch reader), drained with `processAllAvailable`
    * into a memory sink across multiple micro-batches
    * (maxFilesPerTrigger), so the 10×/100× tables cover the streaming
    * STATE paths (watermarked windowed HLL state, dedup key state) and
    * not just their batch twins. */
  val streamFamily: Seq[String] =
    Seq("stream_hll_windowed", "stream_fp_dedup", "stream_crawl_merge",
      "stream_drift_bins", "stream_new_categories",
      "stream_enrich_asof", "stream_sessionize")

  private def streamQuery(
      spark: SparkSession, name: String, dir: String)
      : org.apache.spark.sql.DataFrame = name match {
    case "stream_hll_windowed" =>
      // the sketch_hll_windowed twin: distinct users per hour with
      // 256-register HLL state per open window
      graft.streaming.StreamingOps.hllWindowedStream(
        Tables.readStreamParquet(spark, s"$dir/events.parquet",
          maxFilesPerTrigger = 8),
        "ts", "user_id")
    case "stream_fp_dedup" =>
      // the mm_audio_dedup twin: fingerprint each synthesized clip
      // statelessly, keep the first clip per 64-bit pairing key within
      // the watermark horizon
      val docs = Tables.readStreamParquet(spark, s"$dir/documents.parquet",
        maxFilesPerTrigger = 8)
      val clips = graft.llm.Multimodal
        .synthesizeNearDupAudio(docs, "doc_id")
        .withColumn("ts", timestamp_seconds(
          lit(1700000000L) + pmod(col("doc_id"), lit(3600L))))
      graft.streaming.StreamingOps.fingerprintDedupStream(clips)
    case "stream_crawl_merge" =>
      // the web_crawl_merge twin: both recrawl snapshots' fetch rows
      // emitted per document (explode, no second source scan), merged
      // incrementally — one state row per canonical URL
      val id = col("doc_id")
      val d = Tables.readStreamParquet(spark, s"$dir/documents.parquet",
        maxFilesPerTrigger = 8)
      val fetches = d
        .select(graft.llm.Web.canonicalizeUrl(
          graft.llm.Web.syntheticRecrawlUrl(id)).as("url"), id, col("text"))
        .select(col("url"), explode(array(
          when(pmod(id, lit(10L)) =!= 1, struct(
            (id + lit(1000000000L)).as("fetch_ts"),
            col("text").as("text"))),
          when(pmod(id, lit(10L)) =!= 0, struct(
            (id + lit(1000086400L)).as("fetch_ts"),
            when(pmod(id, lit(10L)).isin(2L, 3L),
              concat(col("text"), lit(" updated")))
              .otherwise(col("text")).as("text"))))).as("f"))
        .filter(col("f").isNotNull)
        .select(col("url"), col("f.fetch_ts").as("fetch_ts"),
          col("f.text").as("text"))
      graft.streaming.StreamingOps.crawlMergeStream(fetches)
    case "stream_drift_bins" =>
      // the mon_drift_bins current-window twin: live (type, $25-bin)
      // histogram with one state row per (group, bin) — state bounded
      // by |groups|·nBins, never by stream length
      graft.streaming.StreamingOps.driftBinCountsStream(
        Tables.readStreamParquet(spark, s"$dir/events.parquet",
          maxFilesPerTrigger = 8)
          .filter(col("value").isNotNull)
          .select(col("event_type"),
            round(col("value") * 100).cast("long").as("cents")),
        "event_type", "cents", stepCents = 2500L, nBins = 20)
    case "stream_new_categories" =>
      // the mon_new_categories twin: (type:props) combinations absent
      // from the day-1 bootstrap vocabulary, first occurrence only —
      // one state row per distinct category (vocabulary-bounded)
      val cat = concat(col("event_type"), lit(":"), col("props"))
      val ref = graft.Monitor.headDaysSplit(
          Tables.read(spark, dir, "events")
            .select(cat.as("category"), col("ts")),
          "ts", days = 1)
        .filter(col("__is_ref") === 1)
        .select("category").distinct()
      graft.streaming.StreamingOps.newCategoriesStream(
        Tables.readStreamParquet(spark, s"$dir/events.parquet",
          maxFilesPerTrigger = 8)
          .select(cat.as("category"), col("ts")),
        ref, "category", "ts")
    case "stream_enrich_asof" =>
      // the flagship PIT join's streaming twin (StreamingSpec proves
      // batch-equality; this prices it at scale): streaming entity rows
      // enriched with the latest static feature row ≤ ts within a 1 h
      // TTL — stream-static left join + watermark-bounded max_by, state
      // one row per in-flight entity, emitted (append) at the watermark
      graft.streaming.StreamingOps.enrichAsOf(
        Tables.readStreamParquet(spark, s"$dir/events.parquet",
          maxFilesPerTrigger = 8)
          .select("user_id", "ts", "event_id"),
        Tables.read(spark, dir, "events")
          .select(col("user_id"), col("ts").as("fts"),
            col("value").as("fval")),
        Seq("user_id"), "ts", "fts", Seq("fval"),
        ttlSeconds = 3600)
    case "stream_sessionize" =>
      // the x_sessionize twin: watermarked session_window aggregation,
      // state = open sessions only, closed sessions emitted append-mode
      graft.streaming.StreamingOps.sessionCounts(
        Tables.readStreamParquet(spark, s"$dir/events.parquet",
          maxFilesPerTrigger = 8)
          .select("user_id", "ts"),
        "ts", "user_id")
    case other =>
      throw new IllegalArgumentException(s"unknown stream probe: $other")
  }

  /** Time one streaming probe: start → drain → stop; (seconds, rows
    * emitted to the sink). */
  def timeStream(
      spark: SparkSession, name: String, dir: String): (Double, Long) = {
    val qn = s"probe_$name"
    val t0 = System.nanoTime()
    val q = streamQuery(spark, name, dir).writeStream
      .format("memory").queryName(qn)
      .outputMode(
        if (Set("stream_fp_dedup", "stream_new_categories",
          "stream_enrich_asof", "stream_sessionize")(name)) "append"
        else "update")
      .start()
    try q.processAllAvailable() finally q.stop()
    val secs = (System.nanoTime() - t0) / 1e9
    // DETERMINISTIC row metric: in update mode the memory sink holds one
    // row PER STATE UPDATE, so the raw count depends on micro-batch
    // boundaries (file listing order under maxFilesPerTrigger) — not a
    // data property (ADVICE r11). Counting distinct final-state KEYS
    // (window start, hll bucket) is stable across any batching.
    val n = name match {
      // update-mode sinks hold one row PER STATE UPDATE (micro-batch-
      // boundary-dependent) — count distinct final-state keys instead
      case "stream_hll_windowed" =>
        spark.table(qn).select("window", "bucket").distinct().count()
      case "stream_crawl_merge" =>
        spark.table(qn).select("url").distinct().count()
      case "stream_drift_bins" =>
        spark.table(qn).select("event_type", "bin").distinct().count()
      case _ => spark.table(qn).count()
    }
    spark.catalog.dropTempView(qn)
    (secs, n)
  }

  /** Median of three drains — same discipline as [[timeMedian3]]. */
  def timeStreamMedian3(
      spark: SparkSession, name: String, dir: String): (Double, Long) = {
    val runs = (1 to 3).map(_ => timeStream(spark, name, dir))
    (runs.map(_._1).sorted.apply(1), runs.head._2)
  }

  /** Time one declared query against one SF dir: (seconds, rows). Same
    * `toRdd.count()` materialization as Bench (see Bench.scala on why
    * `df.count()` would be wrong). */
  def time(spark: SparkSession, name: String, dir: String): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    ((System.nanoTime() - t0) / 1e9, n)
  }

  /** Median of three timed runs (after the caller's warmup) — the same
    * discipline as the main bench metric. A single timed run is exposed
    * to one-off JIT-compile and GC spikes, which at a sub-second steady
    * state masquerade as scale regressions: `knn_lsh_multitable` at 10×
    * measured 3.6 s single-shot vs 0.85 s steady (ratio "11.65" vs the
    * real ≈2), with run-to-run spikes reproducibly bimodal. */
  def timeMedian3(spark: SparkSession, name: String, dir: String): (Double, Long) = {
    val runs = (1 to 3).map(_ => time(spark, name, dir))
    (runs.map(_._1).sorted.apply(1), runs.head._2)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "tmp_scale10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_PROBE_TABLES: restrict corpus generation to the named
    // tables — the PROBE1000 third-decade run only reads events +
    // embeddings and must not spend ~15 GB on a 1000× lineitem
    val probeTables = sys.env.getOrElse("SPARK_GRAFT_PROBE_TABLES", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    require(probeTables.subsetOf(Tables.names.toSet),
      s"unknown table(s) in SPARK_GRAFT_PROBE_TABLES: " +
        probeTables.diff(Tables.names.toSet).toSeq.sorted.mkString(", "))
    ensureCorpus(spark, baseDir, outDir, probeTables)

    // SPARK_GRAFT_PROBE_SKIP: comma-separated query names to exclude —
    // used at the 100× decade for the LICENSED dense-worst-case rows
    // whose cost is quadratic BY CONSTRUCTION (knn_sparse_tfidf on the
    // 31-term corpus: query count × corpus both grow 10×/decade, ratio
    // 39 at 10× — hours at 100×; the realistic-vocabulary scaling
    // evidence lives in graft.VocabProbe instead).
    val skip = sys.env.getOrElse("SPARK_GRAFT_PROBE_SKIP", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    if (skip.nonEmpty) println(s"skipping (licensed rows): ${skip.mkString(", ")}")
    // SPARK_GRAFT_PROBE_ONLY: restrict to named queries — used to append
    // scale evidence for late-round additions without re-timing the
    // whole family
    val only = sys.env.getOrElse("SPARK_GRAFT_PROBE_ONLY", "")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    // A typo'd name would silently produce an empty/partial probe run
    // that still exits 0 and looks like complete scale evidence — fail
    // loudly instead (same for a stale skip-list entry).
    val familySet = family.toSet ++ streamFamily ++ buildFamily
    val unknown = (only ++ skip).diff(familySet)
    require(unknown.isEmpty,
      s"unknown probe query name(s): ${unknown.toSeq.sorted.mkString(", ")} — " +
        s"known: ${(family ++ streamFamily ++ buildFamily).mkString(", ")}")
    val picked =
      if (only.nonEmpty) family.filter(only) else family.filterNot(skip)
    val pickedStream =
      if (only.nonEmpty) streamFamily.filter(only)
      else streamFamily.filterNot(skip)
    val pickedBuild =
      if (only.nonEmpty) buildFamily.filter(only)
      else buildFamily.filterNot(skip)
    // SPARK_GRAFT_PROBE_REPS=1 switches to single-shot timing (no warm
    // run, no median) — for third-decade SPOT probes whose per-run cost
    // is minutes (JIT noise is then a negligible fraction and the
    // median discipline would triple a ~10-minute row).
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    def measure(q: String, dir: String): (Double, Long) =
      if (reps <= 1) time(spark, q, dir)
      else { time(spark, q, dir); timeMedian3(spark, q, dir) }
    def measureStream(q: String, dir: String): (Double, Long) =
      if (reps <= 1) timeStream(spark, q, dir)
      else { timeStream(spark, q, dir); timeStreamMedian3(spark, q, dir) }
    println(f"${"query"}%-22s ${"base_s"}%8s ${"x10_s"}%8s ${"ratio"}%6s ${"base_rows"}%10s ${"x10_rows"}%10s")
    picked.foreach { q =>
      val (tb, nb) = measure(q, baseDir)
      val (tx, nx) = measure(q, outDir)
      println(f"$q%-22s $tb%8.2f $tx%8.2f ${tx / tb}%6.1f $nb%10d $nx%10d")
    }
    pickedStream.foreach { q =>
      val (tb, nb) = measureStream(q, baseDir)
      val (tx, nx) = measureStream(q, outDir)
      println(f"$q%-22s $tb%8.2f $tx%8.2f ${tx / tb}%6.1f $nb%10d $nx%10d")
    }
    def measureBuild(q: String, dir: String): (Double, Long) =
      if (reps <= 1) timeBuild(spark, q, dir)
      else { timeBuild(spark, q, dir); timeBuildMedian3(spark, q, dir) }
    pickedBuild.foreach { q =>
      val (tb, nb) = measureBuild(q, baseDir)
      val (tx, nx) = measureBuild(q, outDir)
      println(f"$q%-22s $tb%8.2f $tx%8.2f ${tx / tb}%6.1f $nb%10d $nx%10d")
    }
    spark.stop()
  }
}
