#!/bin/bash
# Round-9 closing bench: all declared queries at sf0.1 + the BENCH_10x
# standing-table refresh over the full (now 171-query-era) family.
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
echo "=== bench-final start $(date)" | tee /tmp/r9_bench_final.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=3 \
SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/bench_r9_final.json \
java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
  >> /tmp/r9_bench_final.log 2>/tmp/r9_bench_final.err
echo "bench-final rc=$? $(date)" >> /tmp/r9_bench_final.log
echo BENCH_FINAL_DONE
