"""pylatticedso_tpu — TPU-native design, simulation, and optimization of
truss/beam lattice structures.

A ground-up JAX/XLA rebuild of the capabilities of pyLatticeDSO
(Tcadart/pyLatticeDSO): a host-side numpy geometry frontend emits padded
fixed-shape connectivity arrays; the device physics core builds batched
Timoshenko beam stiffness, assembles matrix-free operators via segment-sum,
solves with preconditioned CG on TPU, condenses cells to Schur complements for
the domain-decomposition path, homogenizes unit cells with periodic DOF
folding, and differentiates compliance through the implicit solve.
"""

import os as _os

if not _os.environ.get("PLDSO_NO_COMPILE_CACHE"):
    # persistent XLA compilation cache: remote TPU compiles cost 20-340 s
    # cold; cached reloads take seconds (see utils/cache.py)
    from .utils.cache import enable_compilation_cache as _ecc
    try:
        _ecc()
    except Exception:  # pragma: no cover - e.g. read-only home dir
        pass

from .catalog import get_beam_structure, available_geometries, register_geometry
from .config import LatticeConfig, load_config
from .materials import MatProperties, available_materials, register_material
from .design import Lattice, build_lattice

__version__ = "0.1.0"

__all__ = [
    "get_beam_structure", "available_geometries", "register_geometry",
    "LatticeConfig", "load_config",
    "MatProperties", "available_materials", "register_material",
    "Lattice", "build_lattice",
]
