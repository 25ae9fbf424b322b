"""Persistent XLA compilation cache.

TPU compiles in this environment go through a remote-compile tunnel and cost
20-40 s each; the vmapped Pallas candidate-batch kernel costs ~340 s cold.
JAX's persistent compilation cache amortizes that across processes: the
second process deserializes the executable in seconds.

Enabled automatically on ``import pylatticedso_tpu`` (set
``PLDSO_NO_COMPILE_CACHE=1`` to opt out); the directory is
``PLDSO_COMPILE_CACHE_DIR`` or ``~/.cache/pylatticedso_tpu/xla``.
"""

import os
from pathlib import Path

_enabled = False


def enable_compilation_cache(path=None) -> str:
    """Point jax at a persistent on-disk compilation cache (idempotent).

    Returns the cache directory.  Must run before the first compilation to
    cover it, but is safe at any time.
    """
    global _enabled
    cache_dir = str(Path(
        path
        or os.environ.get("PLDSO_COMPILE_CACHE_DIR")
        or Path.home() / ".cache" / "pylatticedso_tpu" / "xla"))
    if _enabled:
        return cache_dir
    import jax

    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took noticeable compile time; the tunnel's
    # fixed remote-compile latency makes even small programs worth keeping
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir
