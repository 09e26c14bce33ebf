#!/bin/bash
# Round-17 measurement chain. Phases:
#  A  full correctness gate at sf0.01 (Verify + DuckDB compare, 235 queries)
#  B  full BENCH_10X standing-artifact refresh at sf0.1 (regenerates
#     tmp_bench10x — the r16 corpora were cleaned; every row re-prices the
#     shipped code: clustered cached indexes, pruned serving reads, the
#     IMI family, deep BPE encode, blocklist, the two index-build rows)
#  C  PROBE100 second decade for the retrieval/rag/bpe family
#  D  PROBE1000 third decade: the context-pack trio head-to-head
#     (ivf fixedq vs imi), index builds, deep encode
#  E  BpeDepthProbe ladder on the Zipf 10x corpus
#  F  clean idle bench at sf0.1 (reps 3) -> BENCH_r17_idle.json
set -x
cd /root/repo
OPENS=$(printf -- "--add-opens %s=ALL-UNNAMED " java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect java.base/java.io java.base/java.net java.base/java.nio java.base/java.util java.base/java.util.concurrent java.base/java.util.concurrent.atomic java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action java.base/sun.util.calendar)
J="java $OPENS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g -cp target/scala-2.13/classes:/opt/spark/jars/*"

PHASE="${1:-A}"

case "$PHASE" in
A)
  echo "=== A verify start $(date)" | tee /tmp/r17_verify.log
  rm -rf /tmp/verify_r17
  SPARK_GRAFT_CPUS=16 $J graft.Verify /root/testdata/sf0.01 /tmp/verify_r17 \
    >> /tmp/r17_verify.log 2>/tmp/r17_verify.err
  echo "verify rc=$?" >> /tmp/r17_verify.log
  python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_r17 \
    >> /tmp/r17_verify.log 2>&1
  echo "compare rc=$? $(date)" >> /tmp/r17_verify.log
  ;;
B)
  echo "=== B bench10x start $(date)" | tee /tmp/r17_bench10x.log
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_10X=1 SPARK_GRAFT_BENCH_OUT=/tmp/r17_bench_metric.json \
    $J graft.Bench >> /tmp/r17_bench10x.log 2>/tmp/r17_bench10x.err
  echo "bench10x rc=$? $(date)" >> /tmp/r17_bench10x.log
  ;;
C)
  echo "=== C probe100 start $(date)" | tee /tmp/r17_probe100.log
  SPARK_GRAFT_PROBE_ONLY=rag_context_pack,rag_context_pack_fixedq,rag_context_pack_imi,rag_context_pack_pq,knn_imi,knn_imi_recall,knn_ivf,text_bpe_encode,text_blocklist,text_bpe_train,text_bpe_apply,ivf_index_build,imi_index_build \
    $J graft.ScaleProbe tmp_bench10x tmp_scale100 \
    >> /tmp/r17_probe100.log 2>/tmp/r17_probe100.err
  echo "probe100 rc=$? $(date)" >> /tmp/r17_probe100.log
  ;;
D)
  echo "=== D probe1000 start $(date)" | tee /tmp/r17_probe1000.log
  SPARK_GRAFT_PROBE_ONLY=rag_context_pack,rag_context_pack_fixedq,rag_context_pack_imi,rag_context_pack_pq,knn_imi,text_bpe_encode,text_blocklist,ivf_index_build,imi_index_build \
  SPARK_GRAFT_PROBE_TABLES=documents,embeddings \
  SPARK_GRAFT_PROBE_REPS=2 \
    $J graft.ScaleProbe tmp_scale100 tmp_scale1000 \
    >> /tmp/r17_probe1000.log 2>/tmp/r17_probe1000.err
  echo "probe1000 rc=$? $(date)" >> /tmp/r17_probe1000.log
  ;;
E)
  echo "=== E bpedepth start $(date)" | tee /tmp/r17_bpedepth.log
  $J graft.BpeDepthProbe tmp_bench10x 1024 \
    >> /tmp/r17_bpedepth.log 2>/tmp/r17_bpedepth.err
  echo "bpedepth rc=$? $(date)" >> /tmp/r17_bpedepth.log
  ;;
F)
  echo "=== F idle bench start $(date)" | tee /tmp/r17_idle.log
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_OUT=BENCH_r17_idle.json \
    $J graft.Bench >> /tmp/r17_idle.log 2>/tmp/r17_idle.err
  echo "idle rc=$? $(date)" >> /tmp/r17_idle.log
  ;;
esac
echo "PHASE_${PHASE}_DONE"
