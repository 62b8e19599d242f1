#!/bin/bash
# Full-catalog 100x perturbed-replica scale sweep (VERDICT r8 #1), chunked
# so each sbt-free java invocation stays well under any harness timeout and
# a crashed chunk can be re-run alone (results TSV is last-wins per query).
#
# Hardened per VERDICT r9 "what's wrong" #1: each chunk's exit code is
# acted on (one retry, then recorded as failed), and the machine-checked
# assemble gate ALWAYS runs at the end — the script's own exit code is the
# gate's, so a 134/161 TSV or a -1.0 failure sentinel can no longer pass
# silently. Coverage (TSV names vs the full SparkEntry.queries catalog) is
# enforced inside the assemble pass itself (ScaleProbe.assemble).
#
# Usage: tools/scale_sweep.sh [results_tsv]
# Env: SWEEP_CHUNKS="name1 name2" to run a subset of chunks.
#      SWEEP_SKIP_ASSEMBLE=1 to append rows only (assemble later by hand).
set -u
cd "$(dirname "$0")/.."

RESULTS="${1:-target/tmp/scale100_results.tsv}"
SNAP=/tmp/graft_scale_classes
BASE=/root/testdata/sf0.01
BIG=target/tmp/scale_p100
LOG=/tmp/scale_sweep
# Spark scratch off /tmp: the r9 graph chunk died mid-run when a /tmp
# cleaner removed its blockmgr dir ("Cannot call methods on a stopped
# SparkContext") — keep shuffle/blockmgr files under the repo's target/.
LOCAL_DIR="$PWD/target/tmp/spark_local"
mkdir -p "$LOCAL_DIR"

# classpath snapshot: the sweep must not recompile (concurrent source
# edits would break or skew it) — stage the current classes once
rm -rf "$SNAP"
cp -r target/scala-2.13/classes "$SNAP"

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_chunk() {
  local name="$1" queries="$2"
  echo "[sweep] chunk $name starting $(date +%T)"
  SPARK_GRAFT_SF_DIR=$BASE \
  SPARK_GRAFT_SCALE_TIMES=100 \
  SPARK_GRAFT_SCALE_PERTURB=1 \
  SPARK_GRAFT_SCALE_DIR=$BIG \
  SPARK_GRAFT_SCALE_QUERIES="$queries" \
  SPARK_GRAFT_SCALE_RESULTS=$RESULTS \
  SPARK_GRAFT_CPUS=32 \
  java -Xmx24g $ADD_OPENS \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -Dspark.local.dir="$LOCAL_DIR" \
    -cp "$SNAP:/opt/spark/jars/*" graft.ScaleProbe \
    > "$LOG.$name.log" 2>&1
  local rc=$?
  echo "[sweep] chunk $name done rc=$rc $(date +%T)"
  grep -h "\[scale\]" "$LOG.$name.log" | tail -2
  return $rc
}

declare -A CHUNKS
CHUNKS[rqserve]='coarse_fine.*,rq_.*,pq_.*,v6_beam,v11_align,v15_rerank,v_opq_rotate,sq8_roundtrip,a3_centroid_avg,ensemble_.*'
CHUNKS[ann]='ivf.*,knn_.*,lsh_neardup,v1_hash_embed,encoder_swap,dedup_embedding,hkm_.*'
CHUNKS[dedup]='dedup_exact,dedup_minhash.*,dedup_simhash.*,dedup_jaccard.*,dedup_components,dedup_canonical_quality,dedup_semdedup.*,dedup_spans,dedup_span_trim,dedup_suffix_.*,dedup_paragraphs.*,fuzzy_token_pairs,contamination_screen'
CHUNKS[text]='text_.*,bpe_top_pairs,pipeline_.*'
CHUNKS[graph]='graph_.*'
CHUNKS[joins]='skew_join,metrics_.*,j2_group_collect,j5_answer_contain,a7_.*,a8_backfill,a9_inverse_index,p8_id_remap,p9_.*,p10_subsample_reid'
CHUNKS[events]='events_.*,w1_window_rank,sample_.*,sketch_.*,pack_.*'
CHUNKS[mm1]='multimodal_[a-i].*'
CHUNKS[mm2]='multimodal_[j-z].*'
CHUNKS[io]='s[0-9]+_.*,q[0-9]_.*,q_count_distinct,p[1-7]_.*,set_ops,corpus_diff,layout_zorder_probe'

FAILED_CHUNKS=""
ORDER="io events joins dedup text ann rqserve graph mm1 mm2"
for c in ${SWEEP_CHUNKS:-$ORDER}; do
  if ! run_chunk "$c" "${CHUNKS[$c]}"; then
    echo "[sweep] chunk $c FAILED — retrying once"
    if ! run_chunk "$c" "${CHUNKS[$c]}"; then
      echo "[sweep] chunk $c failed twice"
      FAILED_CHUNKS="$FAILED_CHUNKS $c"
    fi
  fi
done
echo "[sweep] chunks done; unique rows: $(cut -f1 "$RESULTS" | sort -u | wc -l); failed chunks:${FAILED_CHUNKS:- none}"

if [ "${SWEEP_SKIP_ASSEMBLE:-0}" = "1" ]; then
  echo "[sweep] SWEEP_SKIP_ASSEMBLE=1 — rows appended, gate not run"
  [ -z "$FAILED_CHUNKS" ]; exit $?
fi

# The gate ALWAYS runs: coverage diff vs the full catalog, torn-line
# tolerance, super-linear threshold, failure sentinels — exit 1 on any.
SPARK_GRAFT_SF_DIR=$BASE \
SPARK_GRAFT_SCALE_TIMES=100 \
SPARK_GRAFT_SCALE_PERTURB=1 \
SPARK_GRAFT_SCALE_ASSEMBLE=1 \
SPARK_GRAFT_SCALE_RESULTS=$RESULTS \
java -Xmx2g $ADD_OPENS -cp "$SNAP:/opt/spark/jars/*" graft.ScaleProbe \
  2>&1 | tee "$LOG.assemble.log"
rc=${PIPESTATUS[0]}
if [ -n "$FAILED_CHUNKS" ]; then
  echo "[sweep] FAILED — chunks never produced rows:$FAILED_CHUNKS"
  exit 1
fi
echo "[sweep] assemble gate rc=$rc"
exit $rc
