#!/bin/bash
# Round-15 PROBE1000 extension (run AFTER run_measures_r15.sh):
# third-decade rows for the two heaviest round-15 newcomers —
#   dedup_paragraphs: 5M docs / ~15M chunk rows through the content-
#     keyed winner aggregate + join + per-doc reassembly;
#   knn_rptree: 2M vectors through 3 median-training window passes +
#     the balanced-leaf equi-join search.
# Single-shot timing (REPS=1) like every PROBE1000 row; corpus tables
# (documents 1.2 GB, embeddings 504 MB) already exist in tmp_scale1000.
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== probe1000 start $(date)" | tee /tmp/r15_probe1000.log
SPARK_GRAFT_PROBE_ONLY=dedup_paragraphs,knn_rptree \
SPARK_GRAFT_PROBE_TABLES=documents,embeddings \
SPARK_GRAFT_PROBE_REPS=1 \
$J graft.ScaleProbe tmp_scale100 tmp_scale1000 >> /tmp/r15_probe1000.log 2>/tmp/r15_probe1000.err
echo "probe1000 rc=$? $(date)" >> /tmp/r15_probe1000.log
echo ALL_DONE
