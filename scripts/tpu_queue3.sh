#!/bin/bash
# Round-3 consolidated unattended TPU queue (replaces tpu_queue.sh +
# tpu_queue2.sh, which serialized the grid-crop benches behind a 2h+ A/B).
# Order is by decision value so a round-end cut loses the least:
#   1. parity evidence collection (the watchdog run's PARITY.json)
#   2. bench variants — baseline, then the perf levers (crop first: the
#      largest expected win), then the all-lever ceiling, then attribution
#      singles and the stage variants
#   3. quality A/B at full scale, decision-critical arms first (incremental
#      per-arm JSON, so a mid-arm cut keeps every finished arm)
#   4. fresh profiles + CPU multi-view rescore
# Rules inherited from queue1: one TPU process (pid in /tmp/tpu_job.pid,
# reaped by bench.py/run_guard), tunnel-wait before every TPU job,
# incremental git commits after each milestone.
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
        echo "[queue3] tunnel down; holding next TPU job"
        sleep 60
    done
}

tpu_job() {           # tpu_job <stdout-file> <stderr-file> cmd...
    local out="$1" err="$2"; shift 2
    tunnel_wait
    "$@" > "$out" 2> "$err" &
    echo $! > /tmp/tpu_job.pid
    wait $! || echo "[queue3] job '$*' exited rc=$?"
}

echo "[queue3] waiting for watchdog (parity run) to finish"
while kill -0 "$(cat /tmp/watchdog.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done
echo "[queue3] parity watchdog exited"

collect() {
    cp -f out/parity_r03d/PARITY.json PARITY_r03.json 2>/dev/null
    cp -f out/parity_r03d/PARITY_MULTIVIEW.json PARITY_MULTIVIEW_r03.json \
        2>/dev/null
    for f in bench_full bench_crop bench_best_all bench_bf16 bench_jitter4 \
             bench_rbg bench_split bench_seq bench_seq_staticw \
             bench_shadeon; do
        [ -s /tmp/$f.json ] && cp -f /tmp/$f.json BENCH_VARIANTS_$f.json
    done
    git add PARITY_r03.json PARITY_MULTIVIEW_r03.json AB_BACKBONE.json \
        BENCH_VARIANTS_*.json 2>/dev/null
    git commit -q -m "Round-3 unattended evidence: $1" 2>/dev/null || true
}
collect "4-stage parity run complete"

echo "[queue3] bench variants (decision order)"
tpu_job /tmp/bench_full.json     /tmp/bench_full.log     \
    env python bench.py
collect "baseline bench"
tpu_job /tmp/bench_crop.json     /tmp/bench_crop.log     \
    env BENCH_GRID_CROP=0.1 python bench.py
tpu_job /tmp/bench_best_all.json /tmp/bench_best_all.log \
    env BENCH_GRID_CROP=0.1 BENCH_BF16=1 BENCH_JITTER=4 D3H_PRNG=rbg \
    python bench.py
collect "crop + all-lever benches"
tpu_job /tmp/bench_bf16.json     /tmp/bench_bf16.log     \
    env BENCH_BF16=1 python bench.py
tpu_job /tmp/bench_jitter4.json  /tmp/bench_jitter4.log  \
    env BENCH_JITTER=4 python bench.py
tpu_job /tmp/bench_rbg.json      /tmp/bench_rbg.log      \
    env D3H_PRNG=rbg python bench.py
collect "single-lever attribution benches"
tpu_job /tmp/bench_split.json    /tmp/bench_split.log    \
    env BENCH_STAGE=split python bench.py
tpu_job /tmp/bench_seq.json      /tmp/bench_seq.log      \
    env BENCH_SCALE=seq python bench.py
tpu_job /tmp/bench_seq_staticw.json /tmp/bench_seq_staticw.log \
    env BENCH_SCALE=seq BENCH_SEQ_STATICW=1 python bench.py
tpu_job /tmp/bench_shadeon.json  /tmp/bench_shadeon.log  \
    env BENCH_SHADING=on python bench.py
collect "stage + reference-equivalent benches"

echo "[queue3] quality A/B at full scale (decision-critical arms first)"
tpu_job /tmp/ab_backbone.log /tmp/ab_backbone.err \
    python scripts/ab_init_arms.py --iters 1000 \
    --arms conv,crop,bf16,jitter4,none,pyramid,cache \
    --n-frames 64 --shuffle --out AB_BACKBONE.json
collect "backbone + lever quality A/B"

echo "[queue3] fresh perf breakdown (feeds the next lever round)"
tpu_job /tmp/profile_step.log /tmp/profile_step.log.err \
    python scripts/profile_step.py
tpu_job /tmp/profile_bwd.log /tmp/profile_bwd.log.err \
    python scripts/profile_bwd.py

# ---- CPU-only follow-ups (safe: every TPU job above has exited) ----------
echo "[queue3] multi-view rescore of the finished stages (CPU)"
D3H_PLATFORM=cpu python scripts/eval_parity.py \
    --out-dir out/parity_r03d --stages split_smpl,init,split,seq \
    > /tmp/rescore_final.log 2>&1

collect "full parity + rescore + A/B + benches"
echo "[queue3] done"
