#!/bin/bash
# Round-3 session-2 queue (fresh environment: out/ and all pretrain caches
# were wiped with the host, so parity checkpoints cannot be resumed — the
# committed PARITY_r03.json / PARITY_MULTIVIEW_r03.json from the live run
# remain the round's parity evidence). This queue spends the live TPU on
# the decision-critical measurements, highest value first:
#   1. baseline full-scale bench (already in flight when this queue starts)
#   2. grid-crop bench + all-lever ceiling (the largest expected perf win)
#   3. focused quality A/B gating the grid_crop default flip: crop vs conv
#      at the stabilized full-scale config (init_lr_scale 0.1), 300 iters
#   4. single-lever attribution benches (bf16 / jitter4 / rbg)
#   5. stage benches (split / seq / seq static-W / shading-on reference eq.)
#   6. remaining quality arms + fresh profiles
# Rules inherited from queue3: one TPU process (pid in /tmp/tpu_job.pid),
# tunnel-wait before every job, incremental git commits per milestone.
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
        echo "[queue4] tunnel down; holding next TPU job"
        sleep 60
    done
}

tpu_job() {           # tpu_job <stdout-file> <stderr-file> cmd...
    local out="$1" err="$2"; shift 2
    tunnel_wait
    "$@" > "$out" 2> "$err" &
    echo $! > /tmp/tpu_job.pid
    wait $! || echo "[queue4] job '$*' exited rc=$?"
}

collect() {
    for f in bench_full bench_crop bench_best_all bench_bf16 bench_jitter4 \
             bench_rbg bench_split bench_seq bench_seq_staticw \
             bench_shadeon; do
        [ -s /tmp/$f.json ] && cp -f /tmp/$f.json BENCH_VARIANTS_$f.json
    done
    git add BENCH_VARIANTS_*.json AB_CROP.json AB_BACKBONE.json 2>/dev/null
    git commit -q -m "Round-3 unattended evidence: $1" 2>/dev/null || true
}

# the previous queue's in-flight job (baseline bench) may still hold the TPU
while kill -0 "$(cat /tmp/tpu_job.pid 2>/dev/null)" 2>/dev/null; do
    sleep 10
done
collect "baseline full-scale bench (fresh-chip capture)"

echo "[queue4] crop + all-lever benches"
tpu_job /tmp/bench_crop.json     /tmp/bench_crop.log     \
    env BENCH_GRID_CROP=0.1 python bench.py
tpu_job /tmp/bench_best_all.json /tmp/bench_best_all.log \
    env BENCH_GRID_CROP=0.1 BENCH_BF16=1 BENCH_JITTER=4 D3H_PRNG=rbg \
    python bench.py
collect "crop + all-lever benches"

echo "[queue4] focused crop quality A/B (gates the grid_crop default)"
tpu_job /tmp/ab_crop.log /tmp/ab_crop.err \
    python scripts/ab_init_arms.py --iters 300 \
    --arms crop,conv --n-frames 64 --shuffle --out AB_CROP.json \
    --grid-cache /tmp/ab_grid_128.npz
collect "crop quality A/B"

echo "[queue4] single-lever attribution benches"
tpu_job /tmp/bench_bf16.json     /tmp/bench_bf16.log     \
    env BENCH_BF16=1 python bench.py
tpu_job /tmp/bench_jitter4.json  /tmp/bench_jitter4.log  \
    env BENCH_JITTER=4 python bench.py
tpu_job /tmp/bench_rbg.json      /tmp/bench_rbg.log      \
    env D3H_PRNG=rbg python bench.py
collect "single-lever attribution benches"

echo "[queue4] stage benches"
tpu_job /tmp/bench_split.json    /tmp/bench_split.log    \
    env BENCH_STAGE=split python bench.py
tpu_job /tmp/bench_seq.json      /tmp/bench_seq.log      \
    env BENCH_SCALE=seq python bench.py
tpu_job /tmp/bench_seq_staticw.json /tmp/bench_seq_staticw.log \
    env BENCH_SCALE=seq BENCH_SEQ_STATICW=1 python bench.py
tpu_job /tmp/bench_shadeon.json  /tmp/bench_shadeon.log  \
    env BENCH_SHADING=on python bench.py
collect "stage + reference-equivalent benches"

echo "[queue4] remaining quality arms at full scale"
tpu_job /tmp/ab_backbone.log /tmp/ab_backbone.err \
    python scripts/ab_init_arms.py --iters 1000 \
    --arms bf16,jitter4,none,pyramid,cache \
    --n-frames 64 --shuffle --out AB_BACKBONE.json \
    --grid-cache /tmp/ab_grid_128.npz
collect "backbone + lever quality A/B"

echo "[queue4] fresh perf breakdown"
tpu_job /tmp/profile_step.log /tmp/profile_step.log.err \
    python scripts/profile_step.py
tpu_job /tmp/profile_bwd.log /tmp/profile_bwd.log.err \
    python scripts/profile_bwd.py
collect "profiles"
echo "[queue4] done"
