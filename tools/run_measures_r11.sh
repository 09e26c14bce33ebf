#!/bin/bash
# Round-11 measurement chain (run inside tmux on an idle box):
#  1. idle-box bench at sf0.1 with the BENCH_10x standing-table refresh —
#     now with interleaved controls, the re-keyed audio/video rows, the
#     sample_* family, knn_sparse_tfidf_pruned, and the streaming twins
#  2. 100x chained probe (tmp_bench10x -> tmp_scale100), dense sparse row
#     skipped (licensed)
#  3. PROBE1000 third-decade spot-probe (tmp_scale100 -> tmp_scale1000,
#     events+embeddings only) for pit_native_asof (AsOfJoin) and
#     dedup_drop_embed (connectedComponentsPerKey)
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== bench start $(date)" | tee /tmp/r11_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r11_idle.json \
$J graft.Bench >> /tmp/r11_bench.log 2>/tmp/r11_bench.err
echo "bench rc=$? $(date)" >> /tmp/r11_bench.log

echo "=== probe100 start $(date)" | tee /tmp/r11_probe100.log
# knn_sparse_tfidf_pruned joins the dense row on the 100x skip list:
# the probe corpus's word-mutation vocabulary is a FLAT 50k-term tail
# whose per-term df grows linearly with the corpus (unlike a real
# Zipfian tail where tail df is O(1)), so with the query set also
# growing 10x/decade even the pruned path is quadratic BY CORPUS
# CONSTRUCTION at the second decade (~3.6e10 candidate rows — filled
# the disk with shuffle spill). The realistic-vocabulary scaling
# evidence for the pruned path is the Zipfian contrast table
# (graft.VocabProbe), same as for the dense row.
SPARK_GRAFT_PROBE_SKIP=knn_sparse_tfidf,knn_sparse_tfidf_pruned \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r11_probe100.log 2>/tmp/r11_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r11_probe100.log

echo "=== probe1000 start $(date)" | tee /tmp/r11_probe1000.log
SPARK_GRAFT_PROBE_ONLY=pit_native_asof,dedup_drop_embed \
SPARK_GRAFT_PROBE_TABLES=events,embeddings \
SPARK_GRAFT_PROBE_REPS=1 \
$J graft.ScaleProbe tmp_scale100 tmp_scale1000 >> /tmp/r11_probe1000.log 2>/tmp/r11_probe1000.err
echo "probe1000 rc=$? $(date)" >> /tmp/r11_probe1000.log
echo ALL_DONE
