#!/bin/bash
# Round-16 CONSOLIDATED measurement chain (run inside tmux on an idle
# box). The earlier r16 chains ran on a box that was since wiped: the
# BENCH_10x refresh landed (149 rows) but the PROBE100/PROBE1000 passes
# were never folded into STATUS, and the operators from sessions 5-6
# (collocations, scenes, forward as-of, champion lists, BFS, epochs,
# winsorize, OOV) have no scale rows at all. This chain re-measures
# everything round 16 touched, once, at the round's final code:
#  1. Idle bench at sf0.1 (self-healing attempts loop) + the BENCH_10x
#     standing-table refresh — now 157+ rows including sessions 5-6.
#  2. PROBE100 (tmp_bench10x -> tmp_scale100) for every round-16 row.
#     knn_sparse_tfidf_pruned is EXCLUDED: on the Zipf corpus its
#     full-postings join is quadratic by construction (58x at the 10x
#     refresh — query set AND corpus both grow), the licensed contrast
#     lives in the standing 10x row, and the corpus-independent scale
#     path is knn_sparse_tfidf_champion (probed here).
#  3. PROBE1000 (tmp_scale100 -> tmp_scale1000, single-shot,
#     documents+embeddings only) for the third-decade text rows +
#     the fixed-|Q| context-pack twin.
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== bench start $(date)" | tee /tmp/r16c_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r16c_idle.json \
$J graft.Bench >> /tmp/r16c_bench.log 2>/tmp/r16c_bench.err
echo "bench rc=$? $(date)" >> /tmp/r16c_bench.log

echo "=== probe100 start $(date)" | tee /tmp/r16c_probe100.log
SPARK_GRAFT_PROBE_ONLY=text_bpe_train,text_bpe_apply,dedup_semdedup,sample_ppl_buckets,web_frontier_schedule,graph_hits,graph_trustrank,text_normalize,text_bool_search,sample_cluster_balanced,graph_triangles,text_classifier_score,sample_temperature,text_collocations,mm_video_scenes,x_asof_forward,knn_sparse_tfidf_champion,graph_bfs_depth,sample_epochs,x_winsorize,text_oov_rate,x_compaction_exec,rag_context_pack,rag_context_pack_fixedq,knn_rptree_forest,knn_rptree_recall,dedup_exact,dedup_drop_exact,dedup_minhash_lsh,dedup_drop_near,dedup_paragraphs,text_tfidf,text_lm_score,text_phrase_search,sample_dsir,web_boilerplate_strip,web_crawl_merge,text_chunks_overlap,web_edges_build \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r16c_probe100.log 2>/tmp/r16c_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r16c_probe100.log

echo "=== probe1000 start $(date)" | tee /tmp/r16c_probe1000.log
SPARK_GRAFT_PROBE_ONLY=dedup_drop_near,web_boilerplate_strip,web_crawl_merge,text_chunks_overlap,rag_context_pack,rag_context_pack_fixedq,dedup_paragraphs,web_edges_build,text_bpe_train,text_bpe_apply,dedup_semdedup \
SPARK_GRAFT_PROBE_TABLES=documents,embeddings \
SPARK_GRAFT_PROBE_REPS=1 \
$J graft.ScaleProbe tmp_scale100 tmp_scale1000 >> /tmp/r16c_probe1000.log 2>/tmp/r16c_probe1000.err
echo "probe1000 rc=$? $(date)" >> /tmp/r16c_probe1000.log
echo ALL_DONE
