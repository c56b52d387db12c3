#!/usr/bin/env bash
# Round-3 TPU measurement sweep: run once the axon tunnel is live.
# Captures (a) the headline render FPS after the round-3 fast path,
# (b) tile-list vs stream-binned training step A/B, (c) knob A/Bs.
# Each arm is bounded so a wedged tunnel can't hang the sweep.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/bench_round3}
mkdir -p "$OUT"

run() {  # name, timeout_s, env..., -- cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" env "$@" 2>>"$OUT/$name.err" | tee "$OUT/$name.out" | tail -2
}

# headline: render FPS + default train arm (the driver's bench)
run bench_default 1500 python bench.py

# training step A/B: stream-binned composite vs tile-list analytic VJP
run train_stream 1200 BENCH_STREAM_TRAIN=1 python bench.py --train-only
run train_stream_g256 1200 BENCH_STREAM_TRAIN=1 LS4D_STREAM_TRAIN_CHUNK=256 \
    python bench.py --train-only

# render knob A/B: Morton table order (default OFF after the r3 A/B)
run render_morton 900 LS4D_STREAM_MORTON=1 python bench.py --render-only

# full-loop training WITH host IO (VERDICT r2 #3 target: >= 0.9x step-only)
run train_e2e 1800 python scripts/bench_train_e2e.py --iters 240

echo "results in $OUT"
