#!/bin/bash
# Round-5 campaign sequencer:
#   1. wait until the legacy-shape 604M campaign has 10 lines in its jsonl
#      (= 5 total legacy pairs: 2 from the interrupted run + 3 new), then
#      stop the remaining legacy rounds;
#   2. run ROUNDS equal-shape pairs (3x2-core vs 12x2-core executors,
#      PARTS=96): both levels pay a near-equal remote-shuffle fraction
#      (2/3 vs 11/12) like a real N->4N executor scale-up, instead of the
#      legacy 0 vs 3/4 that subsidizes the single-executor N leg; 96
#      shuffle partitions = 4 waves at 4N so one straggler no longer
#      idles 23 cores (measured: legacy 4N legs ran ~17/24 busy).
set -u
cd "$(dirname "$0")/.."
LEGACY_OUT=/root/repo/scripts/scaling_evidence_r5_604m.jsonl
TARGET_LINES=10

while true; do
  n=$(grep -c '^{' "$LEGACY_OUT" 2>/dev/null || echo 0)
  pgrep -f 'scaling_pair.sh' >/dev/null || break   # campaign already done
  [ "$n" -ge "$TARGET_LINES" ] && break
  sleep 60
done

if pgrep -f 'scaling_pair.sh' >/dev/null; then
  echo "[watch] $TARGET_LINES legacy legs recorded; stopping legacy campaign" >&2
  pkill -f 'scaling_pair.sh' || true
  sleep 2
  # a leg launched between the line landing and the kill would be orphaned:
  pkill -f 'org.apache.spark.deploy.SparkSubmit.*graft.bench.Scaling' || true
  sleep 5
  pkill -9 -f 'CoarseGrainedExecutorBackend' || true
fi

echo "[watch] launching equal-shape supplement" >&2
export N=2097152 L=288 ITERS=10 CKPT=3
export EXC=2 EXEC_N=3 EXEC_4N=12 PARTS=96
# 10g per 2-core executor = 5 GB/core at BOTH levels (>= the legacy
# protocol's 4 GB/core): the N level's 3 executors each cache ~1/3 of the
# 604M-edge adjacency (~4 GB) — at 8g heap that sits on the storage
# ceiling and evicts under execution pressure, slowing ONLY the N leg (a
# confound that would flatter the ratio). Neither level may spill.
export EXECMEM=10g WORKER_MB=11264 MAXLOAD=3.0
# spark.locality.wait=0s for BOTH levels: the default 3 s makes the
# scheduler idle a slot for up to 3 s waiting for process-locality on
# cached state blocks — after persist/checkpoint cycles the blocks are
# not perfectly balanced, and the stall hits the wide level hardest
# (legacy 4N legs measured ~17/24 cores busy in steady state). Standard
# tuning for iterative workloads; identical at N and 4N.
export CONF="spark.locality.wait=0s"
export ROUNDS=${ROUNDS:-3}
export OUT=/root/repo/scripts/scaling_evidence_r5_eqshape.jsonl
./scripts/scaling_pair.sh
echo "[watch] supplement complete" >&2
