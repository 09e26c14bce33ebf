#!/bin/bash
# Round-13 measurement chain (run inside tmux on an idle box):
#  1. idle-box bench at sf0.1 with the BENCH_10x standing-table refresh —
#     first run of the reuse-coldMain 10x path (ADVICE r12 low) and first
#     scale rows for the round-13 web additions (web_text_extract,
#     web_link_graph, web_host_rank, web_crawl_merge, web_crawl_delta)
#     plus the stream_crawl_merge streaming twin
#  2. 100x chained probe (tmp_bench10x -> tmp_scale100), full family;
#     sparse rows skipped (licensed — see run_measures_r11.sh)
#  3. PROBE1000 third-decade additions: web_link_graph (explode + host-
#     edge aggregate at 5M docs) and web_crawl_merge (canonical-key
#     aggregate) — the corpus from r12's run is reused (documents only)
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== bench start $(date)" | tee /tmp/r13_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r13_idle.json \
$J graft.Bench >> /tmp/r13_bench.log 2>/tmp/r13_bench.err
echo "bench rc=$? $(date)" >> /tmp/r13_bench.log

echo "=== probe100 start $(date)" | tee /tmp/r13_probe100.log
SPARK_GRAFT_PROBE_SKIP=knn_sparse_tfidf,knn_sparse_tfidf_pruned \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r13_probe100.log 2>/tmp/r13_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r13_probe100.log

echo "=== probe1000 start $(date)" | tee /tmp/r13_probe1000.log
SPARK_GRAFT_PROBE_ONLY=web_link_graph,web_crawl_merge \
SPARK_GRAFT_PROBE_TABLES=documents \
SPARK_GRAFT_PROBE_REPS=1 \
$J graft.ScaleProbe tmp_scale100 tmp_scale1000 >> /tmp/r13_probe1000.log 2>/tmp/r13_probe1000.err
echo "probe1000 rc=$? $(date)" >> /tmp/r13_probe1000.log
echo ALL_DONE
