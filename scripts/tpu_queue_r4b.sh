#!/bin/bash
# Round-4 queue, wave 2 — chained after tpu_queue_r4.sh (waits for its pid
# file). Runs the two quality/stability experiments VERDICT r3 asks for,
# then the multiview per-part rescore of the full4_r04 run:
#   1. dense-vs-sparse AA at reference lr 0.03 (stability mechanism
#      discriminator, VERDICT weak#5) -> AB_DENSEAA.json
#   2. perceptual-backbone quality A/B at f3c scale on split_smpl
#      chamfer/IoU/PSNR (VERDICT missing#2) -> AB_PERCEPTUAL_SPLIT.json
#   3. scripts/eval_parity.py on out/full4_r04 (per-part IoU + ceilings +
#      seq per-frame chamfer) -> PARITY_MULTIVIEW_r04.json
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
        echo "[queue-r4b] tunnel down; holding next TPU job"
        sleep 60
    done
}

tpu_job() {
    local out="$1" err="$2"; shift 2
    tunnel_wait
    "$@" > "$out" 2> "$err" &
    echo $! > /tmp/tpu_job.pid
    wait $! || echo "[queue-r4b] job '$*' exited rc=$?"
}

# wait for queue wave 1 (full4 run + benches + profiles)
while kill -0 "$(cat /tmp/queue_r4.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done
echo "[queue-r4b] wave 1 done; starting wave 2"

echo "[queue-r4b] dense-vs-sparse AA stability A/B at lr 0.03"
tpu_job /tmp/ab_denseaa.log /tmp/ab_denseaa.err \
    python scripts/ab_init_arms.py --iters 600 --arms denseaa,conv \
    --n-frames 64 --shuffle --out AB_DENSEAA.json \
    --grid-cache /tmp/ab_grid_128.npz
git add AB_DENSEAA.json 2>/dev/null
git commit -q -m "Dense-vs-sparse AA stability A/B at reference lr 0.03" 2>/dev/null || true

echo "[queue-r4b] perceptual backbone A/B on split_smpl at f3c scale"
tpu_job /tmp/ab_perc_split.log /tmp/ab_perc_split.err \
    python scripts/ab_perceptual_split.py --iters 500 \
    --arms conv,none,pyramid --out AB_PERCEPTUAL_SPLIT.json
git add AB_PERCEPTUAL_SPLIT.json 2>/dev/null
git commit -q -m "Perceptual-backbone quality A/B at f3c scale (split_smpl chamfer/IoU/PSNR)" 2>/dev/null || true

echo "[queue-r4b] multiview per-part rescore of full4_r04"
tpu_job /tmp/eval_parity_r04.log /tmp/eval_parity_r04.err \
    python scripts/eval_parity.py --out-dir out/full4_r04 \
    --config configs/f3c_synth_full4.json --stages split_smpl,init,split,seq
[ -s out/full4_r04/PARITY_MULTIVIEW.json ] && \
    cp -f out/full4_r04/PARITY_MULTIVIEW.json PARITY_MULTIVIEW_r04.json
git add PARITY_MULTIVIEW_r04.json 2>/dev/null
git commit -q -m "Multiview per-part rescore of the r4 full-4-stage run (IoU ceilings + seq per-frame chamfer)" 2>/dev/null || true
echo "[queue-r4b] done"
