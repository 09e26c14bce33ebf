#!/bin/bash
# Round-16 SUPPLEMENTAL measurement pass: PROBE100 rows for the operators
# that landed after the main r16 chain launched (triangles, classifier,
# temperature, collocations, video scenes, forward as-of), plus their
# BENCH_10x standing rows via a targeted re-run. Run AFTER
# run_measures_r16.sh completes, on an idle box.
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

echo "=== probe100b start $(date)" | tee /tmp/r16b_probe100.log
SPARK_GRAFT_PROBE_ONLY=graph_triangles,text_classifier_score,sample_temperature,text_collocations,mm_video_scenes,x_asof_forward,knn_sparse_tfidf_champion \
$J graft.ScaleProbe tmp_bench10x tmp_scale100 >> /tmp/r16b_probe100.log 2>/tmp/r16b_probe100.err
echo "probe100b rc=$? $(date)" >> /tmp/r16b_probe100.log
echo ALL_DONE
