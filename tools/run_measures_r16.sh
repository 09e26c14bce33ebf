#!/bin/bash
# Round-16 measurement chain (run inside tmux on an idle box):
#  0. The documents probe corpora switch to the Zipf(65536) vocabulary
#     this round (honest term-join selectivity — the 31-token base
#     vocabulary made postings×queries joins degenerate quadratically),
#     so the old 10×/100×/1000× documents parquet is deleted and
#     ensureCorpus rebuilds it; events/embeddings/TPC-H tables are
#     byte-identical to r15 and stay.
#  1. Idle-box bench at sf0.1 with the BENCH_10x standing-table
#     refresh — first artifact from the self-healing attempts loop
#     (a dirty pass re-runs in full up to 3×, discarded attempts
#     recorded); first standing 10× rows for the forest pair
#     (VERDICT r15 #3) plus the two round-16 rows
#     (x_compaction_exec, rag_context_pack_fixedq).
#  2. PROBE100 re-run (tmp_bench10x → tmp_scale100) of every
#     document-TEXT row — the corpus their standing values were
#     measured on changed — plus the round-16 new/changed rows
#     (forest pair re-measured under query-side spill; first rows for
#     compaction exec, fixed-|Q| context pack, and the pruned sparse
#     retrieval on an honest vocabulary). Non-text rows (events /
#     embeddings / TPC-H inputs unchanged) keep their standing values.
#  3. PROBE1000 re-run (tmp_scale100 → tmp_scale1000, single-shot) of
#     the third-decade text rows + the fixed-|Q| context-pack twin
#     (VERDICT r15 #6: separate |Q| growth from per-query cost).
cd /root/repo
rm -rf tmp_bench10x/documents.parquet tmp_scale100/documents.parquet \
  tmp_scale1000/documents.parquet
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== bench start $(date)" | tee /tmp/r16_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16_idle.json \
$J graft.Bench >> /tmp/r16_bench.log 2>/tmp/r16_bench.err
echo "bench rc=$? $(date)" >> /tmp/r16_bench.log

echo "=== probe100 start $(date)" | tee /tmp/r16_probe100.log
SPARK_GRAFT_PROBE_ONLY=dedup_exact,dedup_drop_exact,dedup_jaccard_pairs,dedup_jaccard_pairs_capped,dedup_minhash_lsh,dedup_simhash,dedup_clusters,dedup_drop_near,dedup_pairs_against,dedup_ingest,dedup_containment_pairs,dedup_spans,dedup_paragraphs,text_tfidf,text_bm25,text_quality_filter,text_pii_redact,text_lm_score,text_entropy,text_ngram_diversity,text_encode_ids,text_chunks_overlap,text_phrase_search,sample_token_budget,sample_pack_sequences,sample_dsir,pipe_curate,web_boilerplate_strip,web_text_extract,web_crawl_merge,web_crawl_delta,stream_crawl_merge,web_edges_build,rag_context_pack,rag_context_pack_fixedq,knn_rptree_forest,knn_rptree_recall,x_compaction_exec,knn_sparse_tfidf_pruned,text_bpe_train,text_bpe_apply,dedup_semdedup,sample_ppl_buckets,web_frontier_schedule,graph_hits,graph_trustrank,text_normalize,text_bool_search,sample_cluster_balanced,graph_triangles,text_classifier_score,sample_temperature \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r16_probe100.log 2>/tmp/r16_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r16_probe100.log

echo "=== probe1000 start $(date)" | tee /tmp/r16_probe1000.log
SPARK_GRAFT_PROBE_ONLY=dedup_drop_near,web_boilerplate_strip,web_crawl_merge,text_chunks_overlap,rag_context_pack,rag_context_pack_fixedq,dedup_paragraphs,web_edges_build,text_bpe_train,text_bpe_apply,dedup_semdedup \
SPARK_GRAFT_PROBE_TABLES=documents,embeddings \
SPARK_GRAFT_PROBE_REPS=1 \
$J graft.ScaleProbe tmp_scale100 tmp_scale1000 >> /tmp/r16_probe1000.log 2>/tmp/r16_probe1000.err
echo "probe1000 rc=$? $(date)" >> /tmp/r16_probe1000.log
echo ALL_DONE
