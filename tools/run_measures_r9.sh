#!/bin/bash
# Round-9 measurement chain: idle-box bench (+10x standing artifact), then
# the 100x chained probe — now covering the round-8 late additions and the
# round-9 queries (image near-dup, TPC-H Q2/Q7/Q8/Q11/Q16/Q20).
# Run inside tmux; logs to /tmp/r9_*.log
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== bench start $(date)" | tee /tmp/r9_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r9_idle.json \
$J graft.Bench >> /tmp/r9_bench.log 2>/tmp/r9_bench.err
echo "bench rc=$? $(date)" >> /tmp/r9_bench.log
echo "=== probe100 start $(date)" | tee /tmp/r9_probe100.log
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r9_probe100.log 2>/tmp/r9_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r9_probe100.log
echo ALL_DONE
