#!/bin/bash
# Round-8 measurement chain: idle-box bench (+10x standing artifact), then
# the 100x chained probe. Run inside tmux; logs to /tmp/r8_*.log
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== bench start $(date)" | tee /tmp/r8_bench.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r8_idle.json \
$J graft.Bench >> /tmp/r8_bench.log 2>/tmp/r8_bench.err
echo "bench rc=$? $(date)" >> /tmp/r8_bench.log
echo "=== probe100 start $(date)" | tee /tmp/r8_probe100.log
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r8_probe100.log 2>/tmp/r8_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r8_probe100.log
echo ALL_DONE
