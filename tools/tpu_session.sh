#!/bin/bash
# One-window TPU measurement session: run everything that needs the chip, in
# priority order, each step bounded and logged. Designed for a flaky remote
# tunnel — a failure in one step does not block the next, and the highest-
# value measurement (the driver bench) goes first while the tunnel is
# freshest. Never kill this mid-step: a killed in-flight computation wedges
# the axon tunnel for a long time (NOTES.md).
#
#   bash tools/tpu_session.sh [logdir]
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG="${1:-/tmp/tpu_session_$(date +%H%M%S)}"
mkdir -p "$LOG"
cd "$ROOT"

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name (timeout ${t}s) ==="
  ( time timeout "$t" "$@" ) >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "--- $name rc=$rc; tail:"; tail -3 "$LOG/$name.log"
}

# 0. cheap probe: is the tunnel alive at all?
run probe 300 python -c "import jax, jax.numpy as j; print(jax.devices()); print('PROBE_OK', float(j.ones((8,8)).sum()))"
grep -q "PROBE_OK 64" "$LOG/probe.log" || { echo "tunnel dead, aborting"; exit 1; }

# 1. the driver bench (BENCH_r03 rehearsal) — highest value
run bench 1500 python bench.py

# 2. training bench at production batch, with MFU (DS_LOG_FLOPS AOT pass);
#    f16 wire + the depth-1 batch pipeline are the measured-best loop config
run train_bench 2400 python tools/tpu_train_bench.py --wire float16 --steps 80

# 3. batch sweep confirmation at the new default (optional, cheap when cached)
DS_BENCH_BATCH=8 run bench_b8 1200 python bench.py

# 3b. variance-family training bench at its production 80k-frame budget
run train_bench_variance 2400 python tools/tpu_train_bench.py --task variance

# 4. variance->acoustic chain on a shipped reference-scale score (BASELINE #2)
run chain_bench 2400 python tools/tpu_chain_bench.py --record

echo "=== session done; logs in $LOG ==="
grep -h '"metric"' "$LOG"/bench*.log 2>/dev/null
