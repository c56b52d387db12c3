#!/usr/bin/env bash
# Round-4 TPU measurement sweep. Run SOLO — the host has ONE core and the
# axon tunnel's per-frame dispatch is host-bound: any concurrent CPU job
# (tests, a second bench) craters render FPS ~5x (measured 27.8 -> 5.2).
# Raw per-arm outputs are committed under bench_sweeps/ (advisor r3).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-bench_sweeps/r4_sweep}
mkdir -p "$OUT"

run() {  # name, timeout_s, env..., -- cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" env "$@" 2>>"$OUT/$name.err" | tee "$OUT/$name.out" | tail -2
}

# headline: render FPS (ts=32 single-key fast path) + train step + mfu
run bench_default 2300 python bench.py

# render knob A/Bs on the fast path
run render_ts16 900 LS4D_RENDER_TILE=16 python bench.py --render-only
run render_2col 900 LS4D_STREAM_SINGLE_KEY=0 python bench.py --render-only

# full-loop training WITH host IO (VERDICT r3 missing #3: >= 0.9x step-only)
run train_e2e 1800 python scripts/bench_train_e2e.py --iters 240

echo "results in $OUT"
