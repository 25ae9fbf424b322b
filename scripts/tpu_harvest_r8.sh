#!/bin/bash
# Round-5 follow-up queue (duplicated harness from tpu_harvest_r7.sh):
#   1. mg_fused_ab   — fused-vs-unfused V-cycle A/B at bench scale
#   2. bench_extrap  — warm-start secant extrapolation measurement
# Logs in data/outputs/tpu_queue/.  Usage: bash scripts/tpu_harvest_r8.sh
set -u
cd "$(dirname "$0")/.."
OUT=data/outputs/tpu_queue
mkdir -p $OUT
DEADLINE=$(( $(date +%s) + ${HARVEST_BUDGET:-28800} ))
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
  awk '{exit !($1 < 0.6)}' /proc/loadavg
}

step() {
  local name=$1 budget=$2 sentinel=$3; shift 3
  grep -q "$sentinel" "$OUT/$name.log" 2>/dev/null && return 0
  echo "[$(stamp)] try $name (budget ${budget}s)"
  timeout "$budget" "$@" > "$OUT/$name.attempt.log" 2>&1
  local rc=$?
  if grep -q "$sentinel" "$OUT/$name.attempt.log" 2>/dev/null; then
    cp "$OUT/$name.attempt.log" "$OUT/$name.log"
  elif [ ! -f "$OUT/$name.log" ] || \
     [ "$(wc -c < "$OUT/$name.attempt.log")" -ge "$(wc -c < "$OUT/$name.log")" ]; then
    cp "$OUT/$name.attempt.log" "$OUT/$name.log"
  fi
  if grep -q "$sentinel" "$OUT/$name.log" 2>/dev/null; then
    echo "[$(stamp)] $name DONE rc=$rc; tail:"; tail -5 "$OUT/$name.log" | sed 's/^/    /'
    return 0
  fi
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
  step mg_fused_ab 4800 "MG FUSED AB DONE" \
      env N=50 python scripts/mg_fused_ab_tpu.py &&
  step bench_extrap 1500 '"vs_baseline": [0-9]' \
      env BENCH_N=50 BENCH_WARM=extrap python bench.py &&
  break
  sleep 60
done
echo "[$(stamp)] harvest r8 loop exit"
