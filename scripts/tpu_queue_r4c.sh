#!/bin/bash
# Round-4 queue, wave 3 — step-cost attribution (chained after
# tpu_queue_r4b.sh). Each ablation bench removes ONE loss-path component
# from the default full-scale init step; the deltas price that component
# fwd+bwd — the measurement VERDICT r3 next#3 needs before kernel work.
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
        echo "[queue-r4c] tunnel down; holding next TPU job"
        sleep 60
    done
}

tpu_job() {
    local out="$1" err="$2"; shift 2
    tunnel_wait
    "$@" > "$out" 2> "$err" &
    echo $! > /tmp/tpu_job.pid
    wait $! || echo "[queue-r4c] job '$*' exited rc=$?"
}

while kill -0 "$(cat /tmp/queue_r4b.pid 2>/dev/null)" 2>/dev/null; do
    sleep 60
done
echo "[queue-r4c] wave 2 done; starting ablation benches"

run_abl() {         # run_abl <name> [ENV=V ...]
    local name="$1"; shift
    tpu_job /tmp/abl_$name.json /tmp/abl_$name.log env "$@" python bench.py
}

run_abl base
run_abl fwdonly     BENCH_FWDONLY=1
run_abl noaa        BENCH_NO_AA=1
run_abl perc_none   BENCH_PERC=none
run_abl perc_pyr    BENCH_PERC=pyramid
run_abl noeik       BENCH_NO_EIK=1
run_abl nomsdfreg   BENCH_NO_MSDFREG=1

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
print(json.dumps({k: v.get("value") for k, v in out.items()}, indent=0))
EOF
git add BENCH_ABLATION_r04.json 2>/dev/null
git commit -q -m "Init-step cost-attribution ablation benches (fwdonly/AA/perceptual/eikonal/msdf-reg)" 2>/dev/null || true
echo "[queue-r4c] done"
