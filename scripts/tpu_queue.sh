#!/bin/bash
# Prioritized TPU measurement queue (run when the tunnel recovers).
# Each step is bounded and logged under data/outputs/tpu_queue/; a wedge
# in one step cannot eat the rest.  Usage:  bash scripts/tpu_queue.sh
set -u
cd "$(dirname "$0")/.."
OUT=data/outputs/tpu_queue
mkdir -p $OUT
stamp() { date +%H:%M:%S; }

run_step() {  # name budget_sec cmd...
  local name=$1 budget=$2; shift 2
  echo "[$(stamp)] step $name (budget ${budget}s): $*"
  timeout "$budget" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "[$(stamp)] step $name done rc=$rc; tail:"
  tail -5 "$OUT/$name.log" | sed 's/^/    /'
  return $rc
}

# 0. health probe (fail the whole queue fast if the tunnel is wedged)
run_step health 180 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()), jax.devices()[0].device_kind)" || exit 2

# 1. kernel variant sweep at bench scale (picks the fastest matvec)
run_step kernel_sweep 2400 python scripts/kernel_sweep_tpu.py

# 2. bench A/B: current default vs bf16-MG smoother vs winner variant
run_step bench_default 2400 env BENCH_N=50 BENCH_STARTUP_WAIT=60 python bench.py
run_step bench_bf16 2400 env BENCH_N=50 BENCH_STARTUP_WAIT=60 PLDSO_MG_BF16=1 python bench.py
run_step bench_once 2400 env BENCH_N=50 BENCH_STARTUP_WAIT=60 PLDSO_PALLAS_ONCE=1 python bench.py
run_step bench_once_bf16 2400 env BENCH_N=50 BENCH_STARTUP_WAIT=60 PLDSO_PALLAS_ONCE=1 PLDSO_MG_BF16=1 python bench.py
run_step bench_2d 2400 env BENCH_N=50 BENCH_STARTUP_WAIT=60 PLDSO_PALLAS_2D=1 python bench.py

# 3. bench-scale accuracy artifact (VERDICT item 7)
run_step accuracy_n50 1800 env N=50 python scripts/accuracy_tpu.py

# 4. unstructured ELL path at scale (VERDICT item 8)
run_step unstructured_ell 2400 python scripts/unstructured_cg_tpu.py

# 5. DDM chain on TPU vs CPU-x64 oracle (VERDICT item 5)
run_step validate_ddm 3600 python scripts/validate_ddm_tpu.py

echo "[$(stamp)] queue complete; logs in $OUT/"
