#!/bin/bash
# Round-5 TPU measurement queue with a MOSAIC-aware probe.
#
# 2026-08-20 wedge mode: plain XLA ops execute fine but ANY Pallas
# kernel compile hangs forever (the remote tpu_compile_helper stopped
# answering after repeated 2-D sweep crashes).  tpu_harvest.sh's matmul
# probe misses this, so this round's probe compiles a trivial Pallas
# kernel in a SUBPROCESS under timeout (a wedged compile blocks its
# process forever).
#
# Usage: bash scripts/tpu_harvest_r5.sh    (logs in data/outputs/tpu_queue/)
set -u
cd "$(dirname "$0")/.."
OUT=data/outputs/tpu_queue
mkdir -p $OUT
DEADLINE=$(( $(date +%s) + ${HARVEST_BUDGET:-18000} ))
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
    echo "[$(stamp)] $name DONE rc=$rc; tail:"; tail -4 "$OUT/$name.log" | sed 's/^/    /'
    return 0
  fi
  echo "[$(stamp)] $name incomplete rc=$rc; tail:"; tail -3 "$OUT/$name.log" | sed 's/^/    /'
  return 1
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if ! probe; then
    echo "[$(stamp)] mosaic compile path down; sleeping 300s"
    sleep 300
    continue
  fi
  echo "[$(stamp)] mosaic compile path UP"
  step mg_sweep 5400 "MG SWEEP DONE" python scripts/mg_sweep_tpu.py &&
  step unstructured_structured 1200 "compliance" \
      env N=50 python scripts/unstructured_cg_tpu.py structured &&
  step bench_r5_default 1200 '"vs_baseline": [0-9]' \
      env BENCH_N=50 python bench.py &&
  break
  sleep 60
done
echo "[$(stamp)] harvest loop exit"
