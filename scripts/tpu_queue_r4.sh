#!/bin/bash
# Round-4 unattended TPU queue. Priority order = VERDICT.md r3 "next round":
#   1. THE race: all four stages at f3c scale (128^3-crop / 1080^2) at full
#      iteration budgets, under the watchdog, -> out/full4_r04/PARITY.json
#      (committed incrementally as PARITY_r04.json per completed stage).
#   2. seq-stage TPU bench (BENCH_SCALE=seq) — first-ever on-chip capture.
#   3. split-stage bench capture.
#   4. fresh perf profiles for the kernel work (key-dep render + backward).
# Rules (queue3/4 lineage): one TPU process at a time (pid in
# /tmp/tpu_job.pid), tunnel-wait before every job, incremental commits.
set -u
cd "$(dirname "$0")/.."

RUN=out/full4_r04
mkdir -p "$RUN"

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
        echo "[queue-r4] tunnel down; holding next TPU job"
        sleep 60
    done
}

tpu_job() {           # tpu_job <stdout-file> <stderr-file> cmd...
    local out="$1" err="$2"; shift 2
    tunnel_wait
    "$@" > "$out" 2> "$err" &
    echo $! > /tmp/tpu_job.pid
    wait $! || echo "[queue-r4] job '$*' exited rc=$?"
}

commit_parity() {
    [ -s "$RUN/PARITY.json" ] && cp -f "$RUN/PARITY.json" PARITY_r04.json
    git add PARITY_r04.json 2>/dev/null
    git commit -q -m "$1" 2>/dev/null || true
}

# ---- 1. the full 4-stage race (watchdog-supervised; resumable) -----------
echo "[queue-r4] full 4-stage parity run"
tunnel_wait
python scripts/watchdog_train.py --log "$RUN/train.log" --stale-min 15 -- \
    python train_d3h.py --config configs/f3c_synth_full4.json --synthetic \
    --out-dir "$RUN" --iters-scale 1.0 --resume \
    > "$RUN/watchdog.log" 2>&1 &
WD=$!
echo $WD > /tmp/watchdog.pid
# commit parity entries incrementally while the run progresses
while kill -0 $WD 2>/dev/null; do
    sleep 300
    if [ -s "$RUN/PARITY.json" ] && ! cmp -s "$RUN/PARITY.json" PARITY_r04.json 2>/dev/null; then
        commit_parity "full4 r04: parity checkpoint ($(date -u +%H:%M))"
    fi
done
commit_parity "full4 r04: run complete"

# ---- 2. seq-stage TPU bench (first on-chip capture) ----------------------
echo "[queue-r4] seq bench"
tpu_job /tmp/bench_seq.json /tmp/bench_seq.log env BENCH_SCALE=seq python bench.py
[ -s /tmp/bench_seq.json ] && cp -f /tmp/bench_seq.json BENCH_SEQ_r04.json
tpu_job /tmp/bench_seq_staticw.json /tmp/bench_seq_staticw.log \
    env BENCH_SCALE=seq BENCH_SEQ_STATICW=1 python bench.py
[ -s /tmp/bench_seq_staticw.json ] && cp -f /tmp/bench_seq_staticw.json BENCH_SEQ_STATICW_r04.json
git add BENCH_SEQ_r04.json BENCH_SEQ_STATICW_r04.json 2>/dev/null
git commit -q -m "Seq-stage TPU bench capture (serial step + static-skin-weights lever)" 2>/dev/null || true

# ---- 3. split-stage bench -------------------------------------------------
echo "[queue-r4] split bench"
tpu_job /tmp/bench_split.json /tmp/bench_split.log env BENCH_STAGE=split python bench.py
[ -s /tmp/bench_split.json ] && cp -f /tmp/bench_split.json BENCH_SPLIT_r04.json
git add BENCH_SPLIT_r04.json 2>/dev/null
git commit -q -m "Split-stage TPU bench capture" 2>/dev/null || true

# ---- 4. fresh profiles for the kernel work --------------------------------
echo "[queue-r4] profiles"
tpu_job /tmp/profile_micro.log /tmp/profile_micro.err python scripts/profile_micro.py
tpu_job /tmp/profile_bwd.log /tmp/profile_bwd.err python scripts/profile_bwd.py
echo "[queue-r4] done"
