#!/usr/bin/env bash
# Standing 30x probe gate (round-13 verdict #2 promoted this from a
# one-off): n=3 per-key medians over the heaviest keys at sf3
# (= 30x replication of sf0.1 via tools/gen_sf1.py), folded to
# BASELINE_r{N}_sf3.json. This is the leg that catches quadratics two
# green decades hide — the round-13 entity-cluster edge-set OOM was
# invisible at sf0.1 AND sf1 (4.9x ratio) and fatal at sf3.
#
# Usage: tools/bench_sf3.sh <round>          # e.g. tools/bench_sf3.sh 14
#   SF3=/tmp/graft_sf3        fixture dir (generated if missing)
#   SPARK_GRAFT_BENCH_WAIT_QUIET defaults to 300 for gate runs
#
# Reading the record: compare per-key medians against the same round's
# BASELINE_r{N}_sf1.json — the sf1->sf3 step is 3x data, so a healthy
# ratio sits near 3x (shuffle-bound) or below (index/fixed-cost bound);
# sustained super-3x growth on a 3x step is a super-linear term.
set -euo pipefail
cd "$(dirname "$0")/.."
N=${1:?usage: tools/bench_sf3.sh <round number>}
SF3=${SF3:-/tmp/graft_sf3}
# The 12 heaviest keys by sf1 quiet medians (round-13 verdict list) plus
# the two composed dedup-pipeline keys whose whole contract is their
# scaling ratio.
KEYS=q_entity_cluster,q_record_linkage,q_dedup_pipeline,q_semdedup_pipeline
KEYS=$KEYS,q_pagerank,q_graph_components,q_link_predict,q_triangle_count
KEYS=$KEYS,q_dedup_report,q_recommend_incremental,q_semdedup
KEYS=$KEYS,q_events_gap_fill,q_curation_keep
if [ ! -d "$SF3" ]; then
  python3 tools/gen_sf1.py /root/testdata/sf0.1 "$SF3" 30
fi
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=$SF3 \
  SPARK_GRAFT_BENCH_ONLY=$KEYS \
  SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_BENCH_WAIT_QUIET=${SPARK_GRAFT_BENCH_WAIT_QUIET:-300} \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf3_$i.json \
    sbt -batch "runMain graft.Bench" > /tmp/bench_sf3_$i.log 2>&1
  echo "pass $i: $(grep -o '"value":[0-9.]*' /tmp/bench_sf3_$i.json | head -1)"
done
python3 tools/bench_medians.py "BASELINE_r${N}_sf3.json" \
  /tmp/bench_sf3_1.json /tmp/bench_sf3_2.json /tmp/bench_sf3_3.json
echo "wrote BASELINE_r${N}_sf3.json"
