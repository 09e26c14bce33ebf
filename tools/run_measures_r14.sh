#!/bin/bash
# Round-14 measurement chain (run inside tmux on an idle box):
#  1. idle-box bench at sf0.1 with the BENCH_10x standing-table refresh —
#     first run with the hardened contamination detector (endpoint-median
#     window baseline + per-query rep-dispersion flags), the re-measured
#     dedup trio (VERDICT r13 #2), and first scale rows for the round-14
#     additions (rag_mmr_rerank, rag_mmr_rerank_ivf, rag_fusion_rrf_ivf)
#     plus the r13 newcomers' missing rows (text_chunks_overlap; the
#     mon_*/rag_fusion_rrf rows were already in the family list)
#  2. targeted PROBE100 (tmp_bench10x -> tmp_scale100) for the newcomer
#     rows and the web graph pair (now sharing one extraction scan via
#     the webEdges cache — cache-amortized per-query rows, so the
#     extraction itself is priced as the web_edges_build cold row) —
#     merged into the standing table by tools/patch_probe100.py.
#     NEITHER fusion variant is probed at 100x. rag_fusion_rrf: its
#     dense leg is the licensed brute baseline and its sparse leg
#     full-vocabulary knn_sparse_tfidf — both quadratic by construction
#     on this corpus (measured ratio 63.6 at the 10x decade).
#     rag_fusion_rrf_ivf: its DENSE leg (trained IVF) is fine and IS
#     probed via rag_mmr_rerank_ivf / rag_context_pack, but the
#     df-PRUNED sparse leg still inherits the synthetic corpus's FIXED
#     31-token vocabulary — the maxDf gate prunes by df FRACTION, so
#     per-term postings grow linearly with the corpus while the query
#     set also grows linearly: the postings × queries term join is
#     ~18B rows at 100x (measured: filled the 252 GB disk and killed
#     the first r14 probe run). On a real corpus the vocabulary grows
#     with the data and the same gate bounds the join; the synthetic
#     fixture cannot express that, so the row is licensed out exactly
#     like knn_sparse_tfidf / knn_sparse_tfidf_pruned at this decade.
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== bench start $(date)" | tee /tmp/r14_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r14_idle.json \
$J graft.Bench >> /tmp/r14_bench.log 2>/tmp/r14_bench.err
echo "bench rc=$? $(date)" >> /tmp/r14_bench.log

echo "=== probe100 start $(date)" | tee /tmp/r14_probe100.log
SPARK_GRAFT_PROBE_ONLY=mon_drift_bins,mon_drift_stats,mon_ks_value,mon_new_categories,rag_mmr_rerank,rag_mmr_rerank_ivf,rag_context_pack,text_chunks_overlap,web_link_graph,web_host_rank,stream_new_categories,stream_enrich_asof,stream_sessionize,web_edges_build \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r14_probe100.log 2>/tmp/r14_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r14_probe100.log
echo ALL_DONE
