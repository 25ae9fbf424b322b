"""AOT executable persistence for warm process startup.

Remote TPU compiles cost 100-400 s per program family and the persistent
XLA cache only partially covers them through the compile tunnel
(``cache_probe.log``: 346 s cold -> 222 s second process).  Serializing
the COMPILED executables skips XLA/Mosaic entirely: measured at bench
scale (50^3, fused MG step + precond-state build), a fresh process
reaches its first executed step in **36 s total** (10 s deserialize +
0.8 s first dispatch + imports/host build) from a 746 MB artifact
(``aot_probe2.log``; ``scripts/aot_probe_tpu.py`` re-measures).

The artifact is device/runtime-specific — treat it like any other
compilation cache, not a portable export.

    from pylatticedso_tpu.utils.aot import save_executables, load_executables
    cs = {"step": fn.lower(*args).compile(), "pstate": ...}
    save_executables(path, cs)
    # fresh process:
    cs = load_executables(path)
    out = cs["step"](*args)
"""
from __future__ import annotations

import pickle
from pathlib import Path


def save_executables(path, compiled: dict) -> int:
    """Serialize a dict of jax Compiled objects to ``path``; returns the
    artifact size in bytes."""
    from jax.experimental import serialize_executable as se

    blob = {}
    for name, c in compiled.items():
        payload, in_tree, out_tree = se.serialize(c)
        blob[name] = {"payload": payload, "in_tree": in_tree,
                      "out_tree": out_tree}
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "wb") as fh:
        pickle.dump(blob, fh)
    return p.stat().st_size


def load_executables(path) -> dict:
    """Load executables serialized by :func:`save_executables`; each value
    is callable with the original (flattened-pytree-compatible) args."""
    from jax.experimental import serialize_executable as se

    with open(path, "rb") as fh:
        blob = pickle.load(fh)
    return {name: se.deserialize_and_load(b["payload"], b["in_tree"],
                                          b["out_tree"])
            for name, b in blob.items()}
