"""Driver-contract guarantees: bench.py always emits one parseable JSON
line on stdout (rc=0) no matter the TPU tunnel state, and the dryrun
orchestrator streams per-phase results.

These exist because round 2 shipped rc=124 artifacts with empty tails:
a wedged tunnel must degrade into data, not silence."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_always_prints_parseable_json():
    env = dict(os.environ, BENCH_STARTUP_WAIT="1", BENCH_PROBE_TIMEOUT="10",
               BENCH_TOTAL_BUDGET="30")
    # tunnel down: the startup gate fails fast -> "tpu_unavailable";
    # tunnel up: the gate passes and the 30s budget is already below the
    # 120s per-attempt floor -> "budget_exhausted".  Either way: rc=0 and
    # one JSON object on stdout.
    p = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=300, env=env,
                       cwd=REPO)
    assert p.returncode == 0, p.stderr[-500:]
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON on stdout: {p.stdout!r}"
    d = json.loads(lines[-1])
    assert set(d) >= {"metric", "value", "unit", "vs_baseline"}
    assert d["value"] is None and d["error"] in ("tpu_unavailable",
                                                 "budget_exhausted")


def test_dryrun_phase_failure_is_reported():
    """A failing phase must not lose the other phases' results."""
    import __graft_entry__ as g
    seen = []
    real_run = subprocess.run

    def fake_run(cmd, **kw):
        phase = kw.get("env", {}).get("_PLDSO_DRYRUN_PHASE")
        seen.append(phase)
        class R:
            returncode = 1 if phase == "structured" else 0
        return R()

    subprocess.run = fake_run
    try:
        sys.path.insert(0, REPO)
        with pytest.raises(RuntimeError, match="structured: rc=1"):
            g.dryrun_multichip(8)
    finally:
        subprocess.run = real_run
    assert seen == ["unstructured", "structured", "hybrid", "mg"], seen
