#!/bin/bash
# Round-4 session-3 TPU sequence: (1) wait for the running perceptual-split
# A/B (both arms) and commit its JSON; (2) forward-ladder attribution of the
# init step at bench config (the >=1.5 it/s kernel-work target needs fresh
# per-substage numbers — the r3 225ms/211ms split predates the im2col
# perceptual + Pallas gather routing). One commit per completed artifact.
set -u
cd "$(dirname "$0")/.."

AB_PID="${1:-}"
if [ -n "$AB_PID" ]; then
    while kill -0 "$AB_PID" 2>/dev/null; do sleep 30; done
fi
if [ -s AB_PERCEPTUAL_SPLIT.json ] && grep -q '"none"' AB_PERCEPTUAL_SPLIT.json; then
    git add AB_PERCEPTUAL_SPLIT.json
    git commit -q -m "Perceptual-backbone quality A/B at f3c split scale (conv vs none)" || true
fi

# ladder: extract / +LBS / +rast / +interp / +scatter / +jitter / +AA /
# render+eik / tick fwd (skip the render-full, msk, perc rungs — msk is
# trivial, perc is priced by BENCH_PERC, render-full duplicates rung 6)
LADDER_RUNGS=0,1,2,3,4,5,6,9,11 python scripts/profile_ladder.py full \
    > LADDER_r04.txt 2> /tmp/ladder_tpu.err
if grep -q "ms/iter" LADDER_r04.txt; then
    git add LADDER_r04.txt
    git commit -q -m "TPU forward-ladder attribution of the init step (bench config)" || true
fi
echo "[queue-r4e] done"
