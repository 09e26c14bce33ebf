#!/bin/bash
# Round-15 measurement chain (run inside tmux on an idle box):
#  1. idle-box bench at sf0.1 with the BENCH_10x standing-table refresh —
#     first run with the windows-saturated contamination gate (a run
#     where >1/3 of queries sit in suspect control windows re-runs once
#     and self-marks contaminated if it persists — the r14 official
#     artifact's failure shape: n_suspect 102/197 yet contaminated
#     false), and first scale rows for the round-15 additions
#     (web_robots_filter, dedup_paragraphs, text_phrase_search,
#     sample_dsir, knn_rptree, x_compaction_plan).
#  2. targeted PROBE100 (tmp_bench10x -> tmp_scale100) for the round-15
#     newcomers — merged into the standing table by
#     tools/patch_probe100.py (feed the standing rows back in via
#     tools/probe100_standing_log.py; the patcher REPLACES the table).
#     text_phrase_search IS probed: its postings relation is linear in
#     corpus tokens and the phrase set is df-bounded per query doc —
#     unlike the sparse tf-idf rows, the join key is a full 5-gram, so
#     the 31-token vocabulary does not collapse it to a quadratic join
#     at this decade (5-gram space is ~31^5).
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== bench start $(date)" | tee /tmp/r15_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r15_idle.json \
$J graft.Bench >> /tmp/r15_bench.log 2>/tmp/r15_bench.err
echo "bench rc=$? $(date)" >> /tmp/r15_bench.log

echo "=== probe100 start $(date)" | tee /tmp/r15_probe100.log
SPARK_GRAFT_PROBE_ONLY=web_robots_filter,dedup_paragraphs,text_phrase_search,sample_dsir,knn_rptree,x_compaction_plan \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r15_probe100.log 2>/tmp/r15_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r15_probe100.log
echo ALL_DONE
