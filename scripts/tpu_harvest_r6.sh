#!/bin/bash
# Round-6 clean-bench harvest: wait for tunnel recovery AND an idle host,
# then measure the bench default (nu=(1,2) + bf16 smoother + once/align8
# Pallas) with nothing co-running.
#
# Motivation: mg_sweep (data/outputs/tpu_queue/mg_sweep.log) read the
# SAME config at 0.0611 s/step with the same protocol while bench_ab_clean
# read 0.0848 — the TPB deep polish (17.5 h CPU job) co-ran with that A/B,
# and the 1-vCPU host inflates TPU dispatch timings up to 5x under any CPU
# co-load (CLAUDE.md TIMING TRAP).  This harvester refuses to time until
# loadavg-1min < 0.6.
#
# Usage: bash scripts/tpu_harvest_r6.sh   (logs in data/outputs/tpu_queue/)
set -u
cd "$(dirname "$0")/.."
OUT=data/outputs/tpu_queue
mkdir -p $OUT
DEADLINE=$(( $(date +%s) + ${HARVEST_BUDGET:-10000} ))
stamp() { date +%H:%M:%S; }

probe() {
  timeout 180 python - >/dev/null 2>&1 <<'PY'
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0
f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
jax.jit(f)(jnp.ones((8, 128))).block_until_ready()
PY
}

host_idle() {
  # 1-min loadavg below 0.6 => no pytest / polish / surrogate job live
  awk '{exit !($1 < 0.6)}' /proc/loadavg
}

step() {
  local name=$1 budget=$2 sentinel=$3; shift 3
  grep -q "$sentinel" "$OUT/$name.log" 2>/dev/null && return 0
  echo "[$(stamp)] try $name (budget ${budget}s)"
  timeout "$budget" "$@" > "$OUT/$name.attempt.log" 2>&1
  local rc=$?
  # a sentinel-passing attempt ALWAYS replaces the kept log (success
  # output can be shorter than an old failure log)
  if grep -q "$sentinel" "$OUT/$name.attempt.log" 2>/dev/null; then
    cp "$OUT/$name.attempt.log" "$OUT/$name.log"
  elif [ ! -f "$OUT/$name.log" ] || \
     [ "$(wc -c < "$OUT/$name.attempt.log")" -ge "$(wc -c < "$OUT/$name.log")" ]; then
    cp "$OUT/$name.attempt.log" "$OUT/$name.log"
  fi
  if grep -q "$sentinel" "$OUT/$name.log" 2>/dev/null; then
    echo "[$(stamp)] $name DONE rc=$rc; tail:"; tail -4 "$OUT/$name.log" | sed 's/^/    /'
    return 0
  fi
  # tail the LATEST attempt (the kept log may be an older, longer failure)
  echo "[$(stamp)] $name incomplete rc=$rc; tail:"; tail -3 "$OUT/$name.attempt.log" | sed 's/^/    /'
  return 1
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if ! probe; then
    echo "[$(stamp)] tunnel/mosaic down; sleeping 240s"
    sleep 240
    continue
  fi
  if ! host_idle; then
    echo "[$(stamp)] tunnel UP but host busy ($(cut -d' ' -f1 /proc/loadavg)); sleeping 120s"
    sleep 120
    continue
  fi
  echo "[$(stamp)] tunnel UP, host idle"
  step bench_clean_r6 1200 '"vs_baseline": [0-9]' \
      env BENCH_N=50 python bench.py &&
  step bench_frac35_r6 900 '"vs_baseline": [0-9]' \
      env BENCH_N=50 BENCH_MG_FRAC=0.35 python bench.py &&
  step bench_clean2_r6 900 '"vs_baseline": [0-9]' \
      env BENCH_N=50 python bench.py &&
  step mg_sweep2 4800 "MG SWEEP2 DONE" env N=50 python scripts/mg_sweep2_tpu.py &&
  break
  sleep 60
done
echo "[$(stamp)] harvest r6 loop exit"
