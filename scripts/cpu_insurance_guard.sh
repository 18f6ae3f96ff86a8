#!/bin/bash
# Completion guard for the CPU insurance run (tunnel-outage evidence).
#
# Keeps a medium-scale synthetic parity run (full reference iteration
# counts) alive until its PARITY.json contains all four stages, then
# rescores it multi-view and commits the evidence. Pairs with
# scripts/cpu_yield.py, which SIGSTOPs the trainer whenever a TPU client
# is live (the pid file is re-read every poll, so relaunches here are
# picked up automatically).
#
#   bash scripts/cpu_insurance_guard.sh <config.json> <out-dir> <tag> &
#
# Detection: trainer exit (relaunch with --resume), log staleness > 4h
# while NOT frozen by cpu_yield (kill + relaunch; a SIGSTOPped trainer is
# deliberately silent and must not be counted stale).
set -u
cd "$(dirname "$0")/.."

CONFIG="${1:?config}"; OUT="${2:?out dir}"; TAG="${3:?tag}"
LOG=/tmp/cpu_insurance.log
PIDF=/tmp/cpu_insurance.pid
RESTARTS=0

complete() {
    python3 - "$OUT" <<'EOF'
import json, sys
try:
    d = json.load(open(sys.argv[1] + "/PARITY.json"))
    sys.exit(0 if {"split_smpl", "init", "split", "seq"}
             <= set(d.get("stages", {})) else 1)
except Exception:
    sys.exit(1)
EOF
}

tpu_holder_alive() {
    kill -0 "$(cat /tmp/watchdog_child.pid 2>/dev/null)" 2>/dev/null && return 0
    kill -0 "$(cat /tmp/tpu_job.pid 2>/dev/null)" 2>/dev/null && return 0
    return 1
}

launch() {
    echo "[guard] launching trainer (restart $RESTARTS)" >&2
    nohup python train_d3h.py --config "$CONFIG" --synthetic \
        --out-dir "$OUT" --resume >> "$LOG" 2>&1 &
    echo $! > "$PIDF"
    RESTARTS=$((RESTARTS+1))
}

while ! complete; do
    pid=$(cat "$PIDF" 2>/dev/null)
    if [ -n "${pid:-}" ] && kill -0 "$pid" 2>/dev/null; then
        state=$(ps -o stat= -p "$pid" 2>/dev/null)
        case "$state" in
            T*) : ;;   # frozen by cpu_yield while a TPU client runs — fine
            *)
                # staleness: no log write for 4h with a runnable trainer
                if [ -f "$LOG" ]; then
                    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
                    if [ "$age" -gt 14400 ]; then
                        echo "[guard] log stale ${age}s; killing $pid" >&2
                        kill "$pid" 2>/dev/null
                    fi
                fi
                ;;
        esac
        sleep 120
        continue
    fi
    [ "$RESTARTS" -ge 10 ] && { echo "[guard] restart budget out" >&2; break; }
    if tpu_holder_alive; then
        sleep 120      # don't launch into host-CPU contention with the TPU
        continue
    fi
    launch
    sleep 120
done

if complete; then
    echo "[guard] 4 stages complete; collecting" >&2
    cp -f "$OUT/PARITY.json" "PARITY_${TAG}_r03.json"
    D3H_PLATFORM=cpu python scripts/eval_parity.py --out-dir "$OUT" \
        --stages split_smpl,init,split,seq \
        > /tmp/cpu_insurance_rescore.log 2>&1 || true
    [ -f "$OUT/PARITY_MULTIVIEW.json" ] && \
        cp -f "$OUT/PARITY_MULTIVIEW.json" "PARITY_${TAG}_MULTIVIEW_r03.json"
    git add "PARITY_${TAG}_r03.json" "PARITY_${TAG}_MULTIVIEW_r03.json" \
        2>/dev/null
    git commit -q -m "CPU insurance evidence: complete 4-stage ${TAG} parity (full reference iteration counts)" || true
fi
echo "[guard] done" >&2
