"""Reduced-basis + interpolation surrogates for cell Schur complements.

Offline: a greedy orthonormal basis over vectorized Schur matrices
(Fortran-order ravel), matching the reference's algorithm and npz artifact
schema (greedy_algorithm.py:35-233: keys ``basis_reduced_ortho``
[n_b^2, m], ``alpha_ortho`` [m, n_samples], ``list_elements``
[n_samples, d]).

Online: interpolate the reduced coordinates alpha(mu) over the sampled
radii by nearest-neighbor, (multi)linear, or thin-plate-spline RBF
(utils_rbf.py:13-144) and reconstruct S(mu) = unravel(basis @ alpha(mu)).
The TPS-RBF path is pure jnp and differentiable, so dS/dr flows through
``jax.grad`` (replacing the hand-built analytic gradient assembly of
lattice_sim.py:1056-1082).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["reduce_basis_greedy", "save_reduced_basis", "load_reduced_basis",
           "ThinPlateSplineRBF", "SchurSurrogate"]


def reduce_basis_greedy(schur_dict: Dict[tuple, np.ndarray], tol: float,
                        verbose: int = 0):
    """Greedy orthonormal basis over normalized vectorized Schur matrices.

    Returns (basis [n^2, m], alpha [m, n_samples], list_elements
    [n_samples, d]).  Selection: repeatedly take the residual column with the
    largest inf-norm, normalize, deflate — stopping at
    ``tol * ||fields||_inf`` (greedy_algorithm.py:100-128).
    """
    keys = sorted(schur_dict.keys())
    list_elements = np.array([list(k) for k in keys], dtype=float)
    fields = np.stack([np.ravel(schur_dict[k], order="F") for k in keys], axis=1)
    norms = np.linalg.norm(fields, axis=0)
    normalized = fields / norms[None, :]

    resid = normalized.copy()
    atol = tol * np.linalg.norm(resid.T, np.inf)
    basis = []
    n_samples = fields.shape[1]
    for _ in range(n_samples):
        col_norms = np.linalg.norm(resid, np.inf, axis=0)
        s = int(np.argmax(col_norms))
        v = resid[:, s]
        nv = np.linalg.norm(v)
        if nv == 0:
            break
        v = v / nv
        if basis:  # re-orthogonalize against drift of classical deflation
            Bp = np.column_stack(basis)
            v = v - Bp @ (Bp.T @ v)
            v = v / np.linalg.norm(v)
        resid -= np.outer(v, v @ resid)
        basis.append(v)
        if np.linalg.norm(resid.T, np.inf) < atol:
            break
    B = np.column_stack(basis)
    # exact reduced coordinates of the *unnormalized* fields
    alpha = B.T @ fields
    if verbose:
        print(f"reduced basis: {B.shape[1]} vectors for {n_samples} samples")
    return B, alpha, list_elements


def save_reduced_basis(path, basis, alpha, list_elements) -> None:
    np.savez(path, basis_reduced_ortho=basis, alpha_ortho=alpha,
             list_elements=list_elements)


def load_reduced_basis(path) -> dict:
    d = np.load(path)
    return {k: d[k] for k in ("basis_reduced_ortho", "alpha_ortho", "list_elements")}


class ThinPlateSplineRBF:
    """TPS RBF interpolator phi(r) = r^2 log r + linear tail, in jnp.

    Fit on host (dense solve of the bordered system), evaluate/differentiate
    on device.
    """

    def __init__(self, x_train, y_train, reg: float = 0.0):
        pts = np.asarray(x_train, dtype=float)
        targets = np.asarray(y_train, dtype=float)
        if targets.ndim == 1:
            targets = targets[:, None]
        n_pts, d = pts.shape
        # kernel matrix via the same r=0-safe form the device eval uses:
        # r^2 log r = 0.5 * r^2 log r^2
        sq = np.sum((pts[:, None, :] - pts[None, :, :]) ** 2, axis=2)
        kmat = 0.5 * sq * np.log(np.where(sq > 0, sq, 1.0))
        if reg > 0:
            kmat += reg * np.eye(n_pts)
        poly = np.hstack([np.ones((n_pts, 1)), pts])
        # bordered system enforcing polynomial reproduction / orthogonality
        npoly = d + 1
        bordered = np.zeros((n_pts + npoly, n_pts + npoly))
        bordered[:n_pts, :n_pts] = kmat
        bordered[:n_pts, n_pts:] = poly
        bordered[n_pts:, :n_pts] = poly.T
        rhs = np.zeros((n_pts + npoly, targets.shape[1]))
        rhs[:n_pts] = targets
        coeffs = np.linalg.solve(bordered, rhs)
        self.x_train = jnp.asarray(pts)
        self.W = jnp.asarray(coeffs[:n_pts])      # RBF weights
        self.CP = jnp.asarray(coeffs[n_pts:])     # polynomial-tail weights
        self.d = d
        self.m = targets.shape[1]

    def evaluate(self, x: jnp.ndarray) -> jnp.ndarray:
        """f(x) for a single query [d] -> [m]; jit/vmap/grad-safe at r=0."""
        x = jnp.asarray(x)
        diff = x[None, :] - self.x_train
        r2 = jnp.sum(diff**2, axis=1)
        # r^2 log r = 0.5 * r^2 log r^2; safe log at 0
        phi = 0.5 * r2 * jnp.log(jnp.where(r2 > 0, r2, 1.0))
        tail = jnp.concatenate([jnp.ones(1, dtype=x.dtype), x])
        return phi @ self.W + tail @ self.CP

    __call__ = evaluate

    def gradient(self, x: jnp.ndarray) -> jnp.ndarray:
        """Closed-form [d, m] gradient (utils_rbf.py:108-144)."""
        x = jnp.asarray(x)
        diff = x[None, :] - self.x_train
        r2 = jnp.sum(diff**2, axis=1)
        fac = jnp.where(r2 > 0, jnp.log(jnp.where(r2 > 0, r2, 1.0)) + 1.0, 0.0)
        G = jnp.einsum("n,nd,nm->dm", fac, diff, self.W)
        return G + self.CP[1:]


@dataclass
class SchurSurrogate:
    """S(mu) reconstruction from a reduced basis + alpha interpolator.

    kind: "nearest_neighbor" | "linear" | "RBF" (lattice_sim.py:921-1018).
    """

    basis: np.ndarray          # [n^2, m]
    alpha: np.ndarray          # [m, n_samples]
    samples: np.ndarray        # [n_samples, d]
    kind: str = "RBF"
    _rbf: Optional[ThinPlateSplineRBF] = None
    _lin = None

    def __post_init__(self):
        if self.kind == "RBF":
            self._rbf = ThinPlateSplineRBF(self.samples, self.alpha.T)
        elif self.kind == "linear" and self.samples.shape[1] > 1:
            from scipy.interpolate import LinearNDInterpolator
            self._lin = LinearNDInterpolator(self.samples, self.alpha.T)

    @classmethod
    def from_npz(cls, path, kind: str = "RBF") -> "SchurSurrogate":
        d = load_reduced_basis(path)
        return cls(basis=d["basis_reduced_ortho"], alpha=d["alpha_ortho"],
                   samples=d["list_elements"], kind=kind)

    @property
    def n_boundary(self) -> int:
        return int(np.sqrt(self.basis.shape[0]))

    def alpha_of(self, mu: jnp.ndarray) -> jnp.ndarray:
        mu = jnp.atleast_1d(jnp.asarray(mu, dtype=jnp.result_type(float)))
        if self.kind == "RBF":
            return self._rbf.evaluate(mu)
        if self.kind == "nearest_neighbor":
            d2 = jnp.sum((jnp.asarray(self.samples) - mu[None, :])**2, axis=1)
            return jnp.asarray(self.alpha)[:, jnp.argmin(d2)]
        if self.kind == "linear":
            if self._lin is not None:
                out = np.asarray(self._lin(np.asarray(mu)[None]))[0]
                if np.isnan(out).any():
                    raise ValueError(f"query {mu} outside interpolation hull")
                return jnp.asarray(out)
            # 1-D: piecewise-linear on the sorted grid
            xs = jnp.asarray(self.samples[:, 0])
            order = jnp.argsort(xs)
            return jax.vmap(lambda col: jnp.interp(mu[0], xs[order], col[order]))(
                jnp.asarray(self.alpha))
        raise ValueError(f"unknown surrogate kind {self.kind!r}")

    def reconstruct(self, mu) -> jnp.ndarray:
        """S(mu): [n_b, n_b] (Fortran-order unravel of basis @ alpha)."""
        n = self.n_boundary
        vec = jnp.asarray(self.basis) @ self.alpha_of(mu)
        return vec.reshape(n, n, order="F") if isinstance(vec, np.ndarray) \
            else jnp.transpose(vec.reshape(n, n))

    def reconstruct_batch(self, mus: jnp.ndarray) -> jnp.ndarray:
        """Batched reconstruction — one GEMM over all queries
        (get_schur_complement_from_reduced_basis_batch, lattice_sim.py:921-978)."""
        A = jnp.stack([self.alpha_of(m) for m in jnp.asarray(mus)], axis=1)
        n = self.n_boundary
        V = jnp.asarray(self.basis) @ A             # [n^2, q]
        return jnp.transpose(V.reshape(n, n, -1), (2, 1, 0))

    def gradient(self, mu) -> jnp.ndarray:
        """dS/dmu: [d, n_b, n_b] via the differentiable alpha path."""
        n = self.n_boundary
        if self.kind == "RBF":
            dA = self._rbf.gradient(jnp.atleast_1d(jnp.asarray(mu)))  # [d, m]
            V = jnp.einsum("nm,dm->dn", jnp.asarray(self.basis), dA)
            return jnp.transpose(V.reshape(-1, n, n), (0, 2, 1))
        raise NotImplementedError("analytic dS only for the RBF surrogate")
