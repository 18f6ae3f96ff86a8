#!/bin/bash
# Round-3 follow-up TPU queue: the grid_crop lever landed after
# scripts/tpu_queue.sh started (a running bash script must never be
# edited), so its bench variants + quality arm chain here. Waits for the
# first queue to print "[queue] done", then observes the same rules:
# one TPU process, tunnel-wait before each job, pid in /tmp/tpu_job.pid,
# incremental evidence commits.
set -u
cd "$(dirname "$0")/.."

tunnel_wait() {
    until python - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8082), 3).close()
    sys.exit(0)
except OSError:
    sys.exit(1)
EOF
    do
        echo "[queue2] tunnel down; holding next TPU job"
        sleep 60
    done
}

tpu_job() {
    local out="$1" err="$2"; shift 2
    tunnel_wait
    "$@" > "$out" 2> "$err" &
    echo $! > /tmp/tpu_job.pid
    wait $! || echo "[queue2] job '$*' exited rc=$?"
}

echo "[queue2] waiting for tpu_queue.sh (pid file /tmp/tpu_queue.pid)"
while kill -0 "$(cat /tmp/tpu_queue.pid 2>/dev/null)" 2>/dev/null; do
    sleep 120
done
# the first queue's last job may still hold the TPU if the queue was killed
while [ -e /proc/"$(cat /tmp/tpu_job.pid 2>/dev/null || echo 0)" ]; do
    echo "[queue2] last tpu job of queue1 still alive; waiting"
    sleep 60
done
echo "[queue2] starting"

collect() {
    for f in bench_crop bench_best_crop; do
        [ -s /tmp/$f.json ] && cp -f /tmp/$f.json BENCH_VARIANTS_$f.json
    done
    git add BENCH_VARIANTS_bench_crop.json \
        BENCH_VARIANTS_bench_best_crop.json AB_CROP.json 2>/dev/null
    git commit -q -m "Round-3 unattended evidence: $1" 2>/dev/null || true
}

echo "[queue2] grid-crop bench variants"
tpu_job /tmp/bench_crop.json /tmp/bench_crop.log \
    env BENCH_GRID_CROP=0.1 python bench.py
tpu_job /tmp/bench_best_crop.json /tmp/bench_best_crop.log \
    env BENCH_GRID_CROP=0.1 D3H_PRNG=rbg BENCH_JITTER=4 python bench.py
collect "grid-crop bench variants"

echo "[queue2] grid-crop quality arm (1000 iters, full scale)"
tpu_job /tmp/ab_crop.log /tmp/ab_crop.err \
    python scripts/ab_init_arms.py --iters 1000 --arms crop \
    --n-frames 64 --shuffle --out AB_CROP.json
collect "grid-crop quality arm"
echo "[queue2] done"
