#!/bin/bash
# Unattended TPU job queue for round 3 (one-TPU-process rule):
# wait for the parity watchdog to exit, then run the backbone quality A/B
# and the bench variants, logging to /tmp. Safe to start while the tunnel
# is down — everything downstream only fires after parity completes.
set -u
cd "$(dirname "$0")/.."

echo "[queue] waiting for watchdog (parity run) to finish"
while kill -0 "$(cat /tmp/watchdog.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done
echo "[queue] parity watchdog exited"

# refresh the committed parity record from the finished run
if [ -f out/parity_r03d/PARITY.json ]; then
    cp out/parity_r03d/PARITY.json PARITY_r03.json
fi

echo "[queue] backbone quality A/B (conv/pyramid/none/bf16 at the stable config)"
python scripts/ab_init_arms.py --iters 600 --arms conv,pyramid,none,bf16 \
    --n-frames 64 --shuffle --out AB_BACKBONE.json \
    > /tmp/ab_backbone.log 2>&1

echo "[queue] bench variants"
python bench.py > /tmp/bench_full.json 2>/tmp/bench_full.log
BENCH_SHADING=off python bench.py \
    > /tmp/bench_noshade.json 2>/tmp/bench_noshade.log
D3H_PRNG=rbg python bench.py \
    > /tmp/bench_rbg.json 2>/tmp/bench_rbg.log
D3H_PRNG=rbg BENCH_SHADING=off python bench.py \
    > /tmp/bench_rbg_noshade.json 2>/tmp/bench_rbg_noshade.log
BENCH_SCALE=seq python bench.py > /tmp/bench_seq.json 2>/tmp/bench_seq.log

# ---- CPU-only follow-ups (safe: every TPU job above has exited) ----------
echo "[queue] multi-view rescore of the finished stages (CPU)"
D3H_PLATFORM=cpu python scripts/eval_parity.py \
    --out-dir out/parity_r03d --stages split_smpl,init,split,seq \
    > /tmp/rescore_final.log 2>&1

echo "[queue] collect evidence into the repo"
cp -f out/parity_r03d/PARITY.json PARITY_r03.json 2>/dev/null
cp -f out/parity_r03d/PARITY_MULTIVIEW.json PARITY_MULTIVIEW_r03.json \
    2>/dev/null
for f in bench_full bench_noshade bench_rbg bench_rbg_noshade bench_seq; do
    [ -s /tmp/$f.json ] && cp -f /tmp/$f.json BENCH_VARIANTS_$f.json
done
[ -s AB_BACKBONE.json ] || true
git add -A PARITY_r03.json PARITY_MULTIVIEW_r03.json AB_BACKBONE.json \
    BENCH_VARIANTS_*.json 2>/dev/null
git commit -q -m "Round-3 unattended evidence: full 4-stage parity, multi-view rescore, backbone A/B, bench variants" \
    2>/dev/null || true
echo "[queue] done"
