#!/bin/bash
# Round-12 measurement chain (run inside tmux on an idle box):
#  1. idle-box bench at sf0.1 with the BENCH_10x standing-table refresh —
#     now with the cold pair-graph build rows (mm_*_pairs_build), the
#     cache-amortized † annotation, and the df-gated video/MP4 graphs
#  2. 100x chained probe (tmp_bench10x -> tmp_scale100), full family
#     incl. the mm_mp4_* rows (missing from the r11 table — the triad
#     landed after that probe ran); sparse rows skipped (licensed, see
#     run_measures_r11.sh for the corpus-construction argument)
#  3. PROBE1000 third-decade extension to the 4-row table the verdict
#     asked for: the two r11 rows re-measured plus dedup_drop_near
#     (text-shingle CC family) and mm_image_dedup (multimodal CC family);
#     documents generated at 1000x alongside events+embeddings
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== bench start $(date)" | tee /tmp/r12_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r12_idle.json \
$J graft.Bench >> /tmp/r12_bench.log 2>/tmp/r12_bench.err
echo "bench rc=$? $(date)" >> /tmp/r12_bench.log

echo "=== probe100 start $(date)" | tee /tmp/r12_probe100.log
SPARK_GRAFT_PROBE_SKIP=knn_sparse_tfidf,knn_sparse_tfidf_pruned \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r12_probe100.log 2>/tmp/r12_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r12_probe100.log

echo "=== probe1000 start $(date)" | tee /tmp/r12_probe1000.log
SPARK_GRAFT_PROBE_ONLY=pit_native_asof,dedup_drop_embed,dedup_drop_near,mm_image_dedup \
SPARK_GRAFT_PROBE_TABLES=documents,events,embeddings \
SPARK_GRAFT_PROBE_REPS=1 \
$J graft.ScaleProbe tmp_scale100 tmp_scale1000 >> /tmp/r12_probe1000.log 2>/tmp/r12_probe1000.err
echo "probe1000 rc=$? $(date)" >> /tmp/r12_probe1000.log
echo ALL_DONE
