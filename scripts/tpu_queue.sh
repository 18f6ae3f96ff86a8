#!/bin/bash
# Unattended TPU job queue for round 3 (one-TPU-process rule):
# wait for the parity watchdog to exit, then run the backbone quality A/B
# and the bench variants, logging to /tmp. Safe to start while the tunnel
# is down — everything downstream only fires after parity completes, and
# every TPU job (a) waits for the relay port to be live (a client launched
# against a dead tunnel hangs forever in import jax) and (b) records its
# pid in /tmp/tpu_job.pid so the round driver's bench can reap it
# (bench.py:_reap_training_stack) instead of wedging on a shared TPU.
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
        echo "[queue] tunnel down; holding next TPU job"
        sleep 60
    done
}

tpu_job() {           # tpu_job <stdout-file> <stderr-file> cmd...
    local out="$1" err="$2"; shift 2
    tunnel_wait
    "$@" > "$out" 2> "$err" &
    echo $! > /tmp/tpu_job.pid
    wait $! || echo "[queue] job '$*' exited rc=$?"
}

echo "[queue] waiting for watchdog (parity run) to finish"
while kill -0 "$(cat /tmp/watchdog.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done
echo "[queue] parity watchdog exited"

# Incremental evidence collection: commit after EVERY milestone so a
# driver-side reap (bench.py kills this queue before its round-end bench)
# loses nothing already measured.
collect() {
    cp -f out/parity_r03d/PARITY.json PARITY_r03.json 2>/dev/null
    cp -f out/parity_r03d/PARITY_MULTIVIEW.json PARITY_MULTIVIEW_r03.json \
        2>/dev/null
    for f in bench_full bench_shadeon bench_rbg bench_rbg_shadeon \
             bench_seq bench_split bench_seq_staticw \
             bench_bf16 bench_jitter4 bench_best; do
        [ -s /tmp/$f.json ] && cp -f /tmp/$f.json BENCH_VARIANTS_$f.json
    done
    git add PARITY_r03.json PARITY_MULTIVIEW_r03.json AB_BACKBONE.json \
        BENCH_VARIANTS_*.json 2>/dev/null
    git commit -q -m "Round-3 unattended evidence: $1" 2>/dev/null || true
}
collect "4-stage parity run complete"

# Bench variants run FIRST (each ~5-15 min): they inform the round's
# default-flip decisions (rbg PRNG on TPU, bf16 field MLP, jitter
# subsample), so they must land even if the round ends mid-queue. The
# 2h+ quality A/B follows.
echo "[queue] bench variants"
tpu_job /tmp/bench_full.json    /tmp/bench_full.log    \
    env python bench.py
tpu_job /tmp/bench_shadeon.json /tmp/bench_shadeon.log \
    env BENCH_SHADING=on python bench.py
tpu_job /tmp/bench_rbg.json     /tmp/bench_rbg.log     \
    env D3H_PRNG=rbg python bench.py
tpu_job /tmp/bench_rbg_shadeon.json /tmp/bench_rbg_shadeon.log \
    env D3H_PRNG=rbg BENCH_SHADING=on python bench.py
tpu_job /tmp/bench_seq.json     /tmp/bench_seq.log     \
    env BENCH_SCALE=seq python bench.py
tpu_job /tmp/bench_split.json   /tmp/bench_split.log   \
    env BENCH_STAGE=split python bench.py
tpu_job /tmp/bench_seq_staticw.json /tmp/bench_seq_staticw.log \
    env BENCH_SCALE=seq BENCH_SEQ_STATICW=1 python bench.py
tpu_job /tmp/bench_bf16.json    /tmp/bench_bf16.log    \
    env BENCH_BF16=1 python bench.py
tpu_job /tmp/bench_jitter4.json /tmp/bench_jitter4.log \
    env BENCH_JITTER=4 python bench.py
tpu_job /tmp/bench_best.json    /tmp/bench_best.log    \
    env D3H_PRNG=rbg BENCH_SHADING=off BENCH_JITTER=4 python bench.py
collect "bench variants"

echo "[queue] backbone + lever quality A/B at the stable full-scale config"
tpu_job /tmp/ab_backbone.log /tmp/ab_backbone.err \
    python scripts/ab_init_arms.py --iters 1000 \
    --arms conv,pyramid,none,bf16,jitter4,cache \
    --n-frames 64 --shuffle --out AB_BACKBONE.json
collect "backbone + lever A/B"

echo "[queue] fresh perf breakdown (feeds the next lever round)"
tpu_job /tmp/profile_step.log /tmp/profile_step.log.err \
    python scripts/profile_step.py
tpu_job /tmp/profile_bwd.log /tmp/profile_bwd.log.err \
    python scripts/profile_bwd.py

# ---- CPU-only follow-ups (safe: every TPU job above has exited) ----------
echo "[queue] multi-view rescore of the finished stages (CPU)"
D3H_PLATFORM=cpu python scripts/eval_parity.py \
    --out-dir out/parity_r03d --stages split_smpl,init,split,seq \
    > /tmp/rescore_final.log 2>&1

echo "[queue] collect evidence into the repo"
collect "full 4-stage parity, multi-view rescore, backbone A/B, bench variants"
echo "[queue] done"
