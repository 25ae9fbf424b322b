"""Prove (or disprove) the persistent compile cache through the TPU
tunnel (VERDICT r4 #6).

Runs the same bench configuration in TWO fresh subprocesses and compares
their wall clocks.  The package enables ``jax_compilation_cache_dir`` on
import; if remote XLA/Mosaic compiles hit the cache, the second process
skips the 100-400 s compile+cold phase.  Cache-directory entry counts and
bytes are reported around each run, which distinguishes "cache written
but not read back" from "nothing cached at all".

Usage: N=50 python scripts/cache_probe_tpu.py     (CACHE_FRESH=1 wipes
the cache dir first for a cold/warm pair measurement)
"""
import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
N = os.environ.get("N", "50")
cache_dir = Path(os.environ.get("PLDSO_COMPILE_CACHE_DIR")
                 or Path.home() / ".cache" / "pylatticedso_tpu" / "xla")

if os.environ.get("CACHE_FRESH") == "1" and cache_dir.exists():
    shutil.rmtree(cache_dir)
    print(f"wiped {cache_dir}", flush=True)


def cache_stat():
    if not cache_dir.exists():
        return 0, 0
    files = [p for p in cache_dir.rglob("*") if p.is_file()]
    return len(files), sum(p.stat().st_size for p in files)


env = dict(os.environ, BENCH_N=N, BENCH_STEPS="2", BENCH_REPEATS="1",
           JAX_COMPILATION_CACHE_DIR=str(cache_dir))
for run in (1, 2):
    n0, b0 = cache_stat()
    t0 = time.time()
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=1800)
    wall = time.time() - t0
    n1, b1 = cache_stat()
    line = next((l for l in r.stdout.splitlines() if l.startswith("{")), "")
    host_build = json.loads(line)["extra"]["host_build_s"] if line else None
    print(f"run {run}: wall {wall:.1f} s  host_build {host_build} s  "
          f"cache {n0}f/{b0/1e6:.1f}M -> {n1}f/{b1/1e6:.1f}M  rc={r.returncode}",
          flush=True)
    if run == 1:
        wall1 = wall
    if r.returncode != 0:
        print(r.stderr[-1500:], flush=True)
        sys.exit(1)

speedup = wall1 / wall
verdict = ("CACHE WORKS" if wall < 0.5 * wall1 else
           "CACHE INEFFECTIVE (remote compile likely bypasses it)")
print(f"second/first wall: {wall:.1f}/{wall1:.1f} s ({speedup:.1f}x)  "
      f"-> {verdict}", flush=True)
print("CACHE PROBE DONE", flush=True)
