#!/bin/bash
# Round-16 probe phases, re-run at final code: the first r16c probe100
# pass was aborted mid-run when its knn_rptree_forest row measured the
# UNCAPPED boundary spill at 24.8x/decade (probed-leaf multiplier
# (1+2sp/1000)^depth grows as N^0.38 under autoDepth) — the spill is
# now confined to the top RpSpillLevels=3 levels (constant multiplier,
# recall re-measured unchanged at 0.92/0.82), so every row here prices
# the shipped code. Corpora already exist from the r16c chain.
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== probe100 start $(date)" | tee /tmp/r16d_probe100.log
SPARK_GRAFT_PROBE_ONLY=text_bpe_train,text_bpe_apply,dedup_semdedup,sample_ppl_buckets,web_frontier_schedule,graph_hits,graph_trustrank,text_normalize,text_bool_search,sample_cluster_balanced,graph_triangles,text_classifier_score,sample_temperature,text_collocations,mm_video_scenes,x_asof_forward,knn_sparse_tfidf_champion,graph_bfs_depth,sample_epochs,x_winsorize,text_oov_rate,knn_binary_rerank,x_compaction_exec,rag_context_pack,rag_context_pack_fixedq,knn_rptree_forest,knn_rptree_recall,dedup_exact,dedup_drop_exact,dedup_minhash_lsh,dedup_drop_near,dedup_paragraphs,text_tfidf,text_lm_score,text_phrase_search,sample_dsir,web_boilerplate_strip,web_crawl_merge,text_chunks_overlap,web_edges_build \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r16d_probe100.log 2>/tmp/r16d_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r16d_probe100.log

echo "=== probe1000 start $(date)" | tee /tmp/r16d_probe1000.log
SPARK_GRAFT_PROBE_ONLY=dedup_drop_near,web_boilerplate_strip,web_crawl_merge,text_chunks_overlap,rag_context_pack,rag_context_pack_fixedq,dedup_paragraphs,web_edges_build,text_bpe_train,text_bpe_apply,dedup_semdedup \
SPARK_GRAFT_PROBE_TABLES=documents,embeddings \
SPARK_GRAFT_PROBE_REPS=1 \
$J graft.ScaleProbe tmp_scale100 tmp_scale1000 >> /tmp/r16d_probe1000.log 2>/tmp/r16d_probe1000.err
echo "probe1000 rc=$? $(date)" >> /tmp/r16d_probe1000.log
echo ALL_DONE
