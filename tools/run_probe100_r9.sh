#!/bin/bash
# Round-9 100x chained probe (tmp_bench10x -> tmp_scale100), skipping the
# licensed dense-vocab worst case (see SPARK_GRAFT_PROBE_SKIP note in
# ScaleProbe.main — its realistic-vocab evidence comes from VocabProbe).
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"
echo "=== probe100 start $(date)" | tee /tmp/r9_probe100.log
SPARK_GRAFT_PROBE_SKIP=knn_sparse_tfidf \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r9_probe100.log 2>/tmp/r9_probe100.err
echo "probe100 rc=$? $(date)" >> /tmp/r9_probe100.log
echo PROBE100_DONE
