#!/usr/bin/env bash
# Round-5 TPU measurement sweep. Run SOLO — the host has ONE core and the
# axon tunnel's per-frame dispatch is host-bound: any concurrent CPU job
# (tests, a second bench) craters render FPS ~5x (measured 27.8 -> 5.2).
# Raw per-arm outputs are committed under bench_sweeps/ (advisor r3).
#
# Arms (VERDICT r4 next-round list):
#   #3 full-loop training >= 0.9x step-only  -> train_e2e (packed step)
#      + train_e2e_legacy attribution arm (packed step off)
#   #4 frame overhead attribution            -> insitu ladder profile
#   #5 the 360k operating point              -> render_360k (wide-key path)
#   #6 single-key vs 2-col default, >=5 reps -> render_skey_repN/2col_repN
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bench_sweeps/r5_sweep}
mkdir -p "$OUT"

run() {  # name, timeout_s, env..., -- cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" env "$@" 2>>"$OUT/$name.err" | tee "$OUT/$name.out" | tail -2
}

# headline: render FPS (ts=32 single-key fast path) + train step + mfu
run bench_default 2300 python bench.py

# in-situ frame attribution (VERDICT r4 #4): jitted ladder of frame
# prefixes; deltas place the inter-stage glue the stage-sum roofline can't
run insitu 1200 python scripts/profile_frame_insitu.py 30

# the reference's 360k densify cap (train.py:399) through the wide-key path
run render_360k 1200 BENCH_N=360000 python bench.py --render-only

# single-key vs 2-col: alternating reps to decorrelate tunnel drift
REPS=${REPS:-3}
for i in $(seq 1 "$REPS"); do
  run render_skey_rep$i 900 python bench.py --render-only
  run render_2col_rep$i 900 LS4D_STREAM_SINGLE_KEY=0 python bench.py --render-only
done

# full-loop training WITH host IO (target >= 0.9x step-only)
run train_e2e 1800 python scripts/bench_train_e2e.py --iters 240
run train_e2e_legacy 1800 LS4D_PACKED_STEP=0 python scripts/bench_train_e2e.py --iters 240

echo "results in $OUT"
