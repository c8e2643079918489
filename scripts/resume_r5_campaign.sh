#!/bin/bash
# Resume the r5 604M-edge scaling campaign after a session interruption:
# pair 2's N leg is committed in the jsonl but its 4N leg never launched.
# Run the lone 4N leg first (completing pair 2), then ROUNDS more full
# N->4N pairs via scaling_pair.sh. Same parameters as the original launch.
set -u
cd "$(dirname "$0")/.."
export N=2097152 L=288 ITERS=10 CKPT=3 EXC=6 PARTS=24
export EXECMEM=24g WORKER_MB=26624 MAXLOAD=3.0
export OUT=/root/repo/scripts/scaling_evidence_r5_604m.jsonl
JAR=target/scala-2.13/parallelizinggraphalgorithmsspark_2.13-0.1.0.jar

wait_quiet() {
  for _ in $(seq 1 40); do
    load=$(cut -d' ' -f1 /proc/loadavg)
    ok=$(python3 -c "print(1 if $load < $MAXLOAD else 0)")
    [ "$ok" = "1" ] && return 0
    sleep 20
  done
  echo "[resume] proceeding despite load $load" >&2
}

echo "[resume] completing pair 2: lone 4N leg" >&2
wait_quiet
mkdir -p /dev/shm/graft-spark
SPARK_GRAFT_KERNEL=shuffle SPARK_GRAFT_PARTS=$PARTS \
SPARK_GRAFT_CKPT=$CKPT \
SPARK_GRAFT_CONF="" \
SPARK_SCALA_VERSION=2.13 \
SPARK_LOCAL_DIRS=/dev/shm/graft-spark \
SPARK_GRAFT_MASTER="local-cluster[4,$EXC,$WORKER_MB]" \
/opt/spark/bin/spark-submit --driver-memory 8g \
  --conf spark.executor.memory=$EXECMEM \
  --conf spark.network.timeout=600s \
  --conf "spark.executor.extraJavaOptions=-XX:ParallelGCThreads=$EXC -XX:ConcGCThreads=2" \
  --class graft.bench.Scaling "$JAR" "$N" "$L" "$ITERS" --cores $((EXC * 4)) 2>/dev/null \
  | grep '^{' >> "$OUT"

echo "[resume] pair 2 complete; running 4 more full pairs" >&2
ROUNDS=4 ./scripts/scaling_pair.sh
echo "[resume] campaign complete" >&2
