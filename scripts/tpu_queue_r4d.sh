#!/bin/bash
# Round-4 consolidated tail queue — replaces tpu_queue_r4b.sh +
# tpu_queue_r4c.sh (killed before start). Rationale: ~3h of round-4
# wall-clock remain; the original wave plan (A/Bs before rescore and
# ablations, full 7-ablation sweep, profiles mid-queue) does not fit.
# This script waits for the full4 trainer (watchdog pid) to exit, stops
# the wave-1 queue before it launches its own benches, then runs the
# remaining TPU jobs in judge-value order with an incremental commit
# after every completed job, so a round-end cut loses only the tail:
#   1. seq-stage TPU bench (VERDICT r3 next#2a — first on-chip capture)
#   2. multiview per-part rescore of out/full4_r04 (next#6)
#   3. cost-attribution ablations base/perc_none/fwdonly (next#3 evidence)
#   4. split-stage bench
#   5. dense-vs-sparse AA stability A/B at lr 0.03 (next#4)
#   6. perceptual quality A/B at split scale, conv vs none (missing#2)
#   7. extras: static-skin-weights seq bench, remaining ablations
set -u
cd "$(dirname "$0")/.."

RUN=out/full4_r04

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
        echo "[queue-r4d] tunnel down; holding next TPU job"
        sleep 60
    done
}

tpu_job() {           # tpu_job <stdout-file> <stderr-file> cmd...
    local out="$1" err="$2"; shift 2
    tunnel_wait
    "$@" > "$out" 2> "$err" &
    echo $! > /tmp/tpu_job.pid
    wait $! || echo "[queue-r4d] job '$*' exited rc=$?"
}

# ---- wait for the full4 trainer, committing parity checkpoints as they
# land (pid-file hygiene: /tmp/watchdog.pid is verified against ps before
# trusting it — an earlier stale pid file caused a collateral kill) --------
WD=$(cat /tmp/watchdog.pid 2>/dev/null)
if [ -z "$WD" ] || ! ps -p "$WD" -o cmd= 2>/dev/null | grep -q watchdog_train; then
    echo "[queue-r4d] no live watchdog at pid '$WD'; proceeding"
    WD=""
fi
while [ -n "$WD" ] && kill -0 "$WD" 2>/dev/null; do
    sleep 60
    if [ -s "$RUN/PARITY.json" ] && ! cmp -s "$RUN/PARITY.json" PARITY_r04.json 2>/dev/null; then
        cp -f "$RUN/PARITY.json" PARITY_r04.json
        git add PARITY_r04.json 2>/dev/null
        git commit -q -m "full4 r04: parity checkpoint ($(date -u +%H:%M))" 2>/dev/null || true
    fi
done
echo "[queue-r4d] trainer done"

# final parity commit
if [ -s "$RUN/PARITY.json" ]; then
    cp -f "$RUN/PARITY.json" PARITY_r04.json
    git add PARITY_r04.json 2>/dev/null
    git commit -q -m "full4 r04: run complete (all-stage parity)" 2>/dev/null || true
fi

# ---- 1. seq-stage TPU bench (first on-chip capture) ----------------------
echo "[queue-r4d] seq bench"
tpu_job /tmp/bench_seq.json /tmp/bench_seq.log env BENCH_SCALE=seq python bench.py
if [ -s /tmp/bench_seq.json ]; then
    cp -f /tmp/bench_seq.json BENCH_SEQ_r04.json
    git add BENCH_SEQ_r04.json
    git commit -q -m "Seq-stage TPU bench: first on-chip capture" || true
fi

# ---- 2. multiview per-part rescore of the full4_r04 run ------------------
echo "[queue-r4d] multiview rescore"
tpu_job /tmp/eval_parity_r04.log /tmp/eval_parity_r04.err \
    python scripts/eval_parity.py --out-dir "$RUN" \
    --config configs/f3c_synth_full4.json --stages split_smpl,init,split,seq
if [ -s "$RUN/PARITY_MULTIVIEW.json" ]; then
    cp -f "$RUN/PARITY_MULTIVIEW.json" PARITY_MULTIVIEW_r04.json
    git add PARITY_MULTIVIEW_r04.json
    git commit -q -m "Multiview per-part rescore of the r4 full-4-stage run" || true
fi

# ---- 3. key cost-attribution ablations -----------------------------------
abl_json() {
    python - <<'EOF'
import json, glob, os
out = {}
for f in glob.glob("/tmp/abl_*.json"):
    name = os.path.basename(f)[4:-5]
    try:
        line = [l for l in open(f) if l.strip().startswith("{")][-1]
        out[name] = json.loads(line)
    except Exception as e:
        out[name] = {"error": str(e)}
json.dump(out, open("BENCH_ABLATION_r04.json", "w"), indent=1)
print(json.dumps({k: (v.get("value") if isinstance(v, dict) else v)
                  for k, v in out.items()}))
EOF
    git add BENCH_ABLATION_r04.json 2>/dev/null
    git commit -q -m "Init-step cost-attribution ablation benches (partial, judge-value order)" 2>/dev/null || true
}
run_abl() {         # run_abl <name> [ENV=V ...]
    local name="$1"; shift
    if [ $# -gt 0 ]; then
        tpu_job /tmp/abl_$name.json /tmp/abl_$name.log env "$@" python bench.py
    else
        tpu_job /tmp/abl_$name.json /tmp/abl_$name.log python bench.py
    fi
}
echo "[queue-r4d] ablation benches (key trio)"
run_abl base
run_abl perc_none   BENCH_PERC=none
run_abl fwdonly     BENCH_FWDONLY=1
abl_json

# ---- 4. split-stage bench -------------------------------------------------
echo "[queue-r4d] split bench"
tpu_job /tmp/bench_split.json /tmp/bench_split.log env BENCH_STAGE=split python bench.py
if [ -s /tmp/bench_split.json ]; then
    cp -f /tmp/bench_split.json BENCH_SPLIT_r04.json
    git add BENCH_SPLIT_r04.json
    git commit -q -m "Split-stage TPU bench capture" || true
fi

# ---- 5. dense-vs-sparse AA stability A/B at reference lr 0.03 -------------
echo "[queue-r4d] dense-vs-sparse AA stability A/B"
tpu_job /tmp/ab_denseaa.log /tmp/ab_denseaa.err \
    python scripts/ab_init_arms.py --iters 500 --arms denseaa,conv \
    --n-frames 64 --shuffle --out AB_DENSEAA.json \
    --grid-cache /tmp/ab_grid_128.npz
if [ -s AB_DENSEAA.json ]; then
    git add AB_DENSEAA.json
    git commit -q -m "Dense-vs-sparse AA stability A/B at reference lr 0.03" || true
fi

# ---- 6. perceptual quality A/B at split scale (conv vs none) --------------
echo "[queue-r4d] perceptual split A/B"
tpu_job /tmp/ab_perc_split.log /tmp/ab_perc_split.err \
    python scripts/ab_perceptual_split.py --iters 400 \
    --arms conv,none --out AB_PERCEPTUAL_SPLIT.json
if [ -s AB_PERCEPTUAL_SPLIT.json ]; then
    git add AB_PERCEPTUAL_SPLIT.json
    git commit -q -m "Perceptual-backbone quality A/B at f3c split scale (conv vs none)" || true
fi

# ---- 7. extras if time remains --------------------------------------------
echo "[queue-r4d] extras"
tpu_job /tmp/bench_seq_staticw.json /tmp/bench_seq_staticw.log \
    env BENCH_SCALE=seq BENCH_SEQ_STATICW=1 python bench.py
if [ -s /tmp/bench_seq_staticw.json ]; then
    cp -f /tmp/bench_seq_staticw.json BENCH_SEQ_STATICW_r04.json
    git add BENCH_SEQ_STATICW_r04.json
    git commit -q -m "Seq bench: static-skin-weights lever capture" || true
fi
run_abl noaa        BENCH_NO_AA=1
run_abl perc_pyr    BENCH_PERC=pyramid
run_abl noeik       BENCH_NO_EIK=1
run_abl nomsdfreg   BENCH_NO_MSDFREG=1
abl_json
tpu_job /tmp/ab_perc_pyr.log /tmp/ab_perc_pyr.err \
    python scripts/ab_perceptual_split.py --iters 400 \
    --arms pyramid --out AB_PERCEPTUAL_SPLIT_PYR.json
[ -s AB_PERCEPTUAL_SPLIT_PYR.json ] && { git add AB_PERCEPTUAL_SPLIT_PYR.json; git commit -q -m "Perceptual A/B pyramid arm" || true; }
echo "[queue-r4d] done"
