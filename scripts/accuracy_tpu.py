"""End-to-end 1e-8 accuracy demonstration on the real TPU.

BASELINE.md's accuracy row demands displacements matching a float64 oracle
to <=1e-8 rtol.  TPUs have no fast native f64, so the production solve is
f32 PCG; ``pcg_refined`` recovers full accuracy by computing the residual
in XLA-emulated f64 (slow per-op but used ~once per refinement pass) and
re-solving the correction in f32.

The f64 oracle runs in a CPU subprocess (native f64; the TPU's
emulated-f64 while_loop at oracle lengths exceeds the tunnel's execution
budget); the f32 and refined solves run on the TPU.

Usage: N=16 python scripts/accuracy_tpu.py

At bench scale (N >= 40, or NO_ORACLE=1) the CPU f64 oracle is far out of
the throttled host's reach; the script instead certifies the refined
solve by its XLA-emulated-f64 relative residual ||b - A x|| / ||b|| (the
same quantity ``pcg_refined`` drives down), and reports the measured
refined-vs-f32 cost ratio.
"""
import os, subprocess, sys, time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N = int(os.environ.get("N", "16"))
GEOM = os.environ.get("GEOM", "Octet")
ORACLE_NPZ = Path(os.environ.get("ORACLE_NPZ", f"/tmp/oracle_{GEOM}_{N}.npz"))


def build_problem(jnp, dtype):
    import numpy as np
    from pylatticedso_tpu.parallel.structured import StructuredLattice
    slat = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                             dtype=dtype)
    rng = np.random.default_rng(0)
    r_np = 0.05 + 0.03 * rng.random((N, N, N))
    free_np = np.ones((slat.nc, 6) + slat.grid, bool)
    free_np &= slat.node_valid[:, None]
    zmin = slat.select_nodes(lambda x, y, z: z < 1e-9)
    free_np &= ~zmin[:, None]
    f_np = np.zeros((slat.nc, 6) + slat.grid, np.float64)
    zmax = slat.select_nodes(lambda x, y, z: z > N - 1e-9)
    f_np[:, 2][zmax] = -0.1
    mv, diag = slat.make_matvec()
    free = jnp.asarray(free_np, dtype)
    b = jnp.asarray(f_np, dtype) * free
    r = jnp.asarray(r_np, dtype)
    aux = mv.prepare(r)
    A = lambda u: free * mv.apply(free * u, aux) + (1 - free) * u
    d = free * diag(r) + (1 - free)
    d = jnp.where(d == 0, 1.0, d)
    return A, b, d


def oracle_main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from pylatticedso_tpu.fem.solve import pcg
    A, b, d = build_problem(jnp, jnp.float64)
    t0 = time.time()
    out = jax.jit(lambda: pcg(A, b, M=lambda r: r / d,
                              maxiter=40000, tol=1e-14))()
    ux = np.asarray(out.x)
    np.savez(ORACLE_NPZ, ux=ux, iters=int(out.iterations),
             res=float(out.residual_norm))
    print(f"f64 oracle (cpu): {int(out.iterations)} iters, "
          f"res {float(out.residual_norm):.2e}, {time.time()-t0:.1f} s",
          flush=True)


def main():
    no_oracle = os.environ.get("NO_ORACLE") == "1" or N >= 40
    import numpy as np
    if not no_oracle:
        if not ORACLE_NPZ.exists():
            env = dict(os.environ, ORACLE_MODE="1")
            subprocess.run([sys.executable, __file__], env=env, check=True)
        dat = np.load(ORACLE_NPZ)
        ux_np = dat["ux"]
        print(f"oracle: {int(dat['iters'])} iters, res {float(dat['res']):.2e}")
    else:
        ux_np = None
        print("no f64 oracle at this scale; certifying by emulated-f64 "
              "relative residual")

    import jax
    if os.environ.get("PLDSO_PLATFORM"):   # e.g. cpu smoke runs
        jax.config.update("jax_platforms", os.environ["PLDSO_PLATFORM"])
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    from pylatticedso_tpu.fem.solve import pcg, pcg_refined
    from pylatticedso_tpu.parallel.structured import StructuredLattice
    print(f"{GEOM} {N}^3 on {jax.devices()[0].platform}")

    # operator closures carry only the mv callables; every array operand is
    # a jit ARGUMENT — closure-captured arrays embed as XLA constants, and
    # a remote compile carrying tens of MB of constants takes minutes
    s32 = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                            dtype=jnp.float32)
    s64 = StructuredLattice(GEOM, (N, N, N), (1.0, 1.0, 1.0), 1013.0, 0.3,
                            dtype=jnp.float64)
    mv32, diag32 = s32.make_matvec()
    mv64, _ = s64.make_matvec()
    _, b64, _ = build_problem(jnp, jnp.float64)
    import numpy as _np
    rng = _np.random.default_rng(0)
    r_np = 0.05 + 0.03 * rng.random((N, N, N))
    free_np = _np.ones((s32.nc, 6) + s32.grid, bool)
    free_np &= s32.node_valid[:, None]
    zmin = s32.select_nodes(lambda x, y, z: z < 1e-9)
    free_np &= ~zmin[:, None]
    free32 = jnp.asarray(free_np, jnp.float32)
    b32d = b64.astype(jnp.float32)
    aux32 = jax.jit(mv32.prepare)(jnp.asarray(r_np, jnp.float32))
    aux64 = jax.jit(mv64.prepare)(jnp.asarray(r_np, jnp.float64))
    d32 = free32 * diag32(jnp.asarray(r_np, jnp.float32)) + (1 - free32)
    d32 = jnp.where(d32 == 0, 1.0, d32)
    ux = None if ux_np is None else jnp.asarray(ux_np)

    @jax.jit
    def resid_hi(x32, b64_, aux_hi, free):
        """Emulated-f64 relative residual of a (f32) solution."""
        free_hi = free.astype(jnp.float64)
        x = x32.astype(jnp.float64)
        A_hi = lambda u: free_hi * mv64.apply(free_hi * u, aux_hi) \
            + (1 - free_hi) * u
        r = b64_ - A_hi(x)
        return jnp.linalg.norm(r.ravel()) / jnp.linalg.norm(b64_.ravel())

    @jax.jit
    def solve32(b, aux, free, d):
        A = lambda u: free * mv32.apply(free * u, aux) + (1 - free) * u
        return pcg(A, b, M=lambda r: r / d, maxiter=20000, tol=1e-7)

    t0 = time.time()
    out32 = solve32(b32d, aux32, free32, d32)
    u32 = out32.x.block_until_ready()
    t32 = time.time() - t0
    res32 = float(resid_hi(u32, b64, aux64, free32))
    msg = f"f32 solve: {int(out32.iterations)} iters, {t32:.1f} s, " \
          f"emulated-f64 rel residual {res32:.3e}"
    if ux is not None:
        err32 = float(jnp.linalg.norm((u32.astype(jnp.float64) - ux).ravel())
                      / jnp.linalg.norm(ux.ravel()))
        msg += f", rel err vs f64 oracle {err32:.3e}"
    print(msg)

    if ux is not None:
        # oracle scale: the monolithic jitted refinement fits one dispatch
        @jax.jit
        def solve_refined(b32_, b64_, aux, aux_hi, free, d):
            free_hi = free.astype(jnp.float64)
            A = lambda u: free * mv32.apply(free * u, aux) + (1 - free) * u
            A_hi = lambda u: free_hi * mv64.apply(free_hi * u, aux_hi) \
                + (1 - free_hi) * u
            return pcg_refined(A, b32_, M=lambda r: r / d, maxiter=20000,
                               tol=1e-7, refinements=3,
                               residual_fn=lambda x: b64_ - A_hi(x))

        t0 = time.time()
        ref = solve_refined(b32d, b64, aux32, aux64, free32, d32)
        uref = ref.x.block_until_ready()
        tref = time.time() - t0
        resref = float(resid_hi(uref, b64, aux64, free32))
        errref = float(jnp.linalg.norm((uref - ux).ravel())
                       / jnp.linalg.norm(ux.ravel()))
        print(f"refined solve: {int(ref.iterations)} total inner iters, "
              f"{tref:.1f} s, emulated-f64 rel residual {resref:.3e}, "
              f"rel err vs f64 oracle {errref:.3e}")
        print("PASS" if errref <= 1e-8 else "FAIL", "(target 1e-8)")
    else:
        # bench scale: one jitted pcg_refined pass would be a single >60 s
        # dispatch and the tunnel kills it ("TPU device error").  Run the
        # refinement loop on the HOST instead — each emulated-f64 residual
        # and each f32 correction solve is its own bounded dispatch.
        @jax.jit
        def resid_vec(x_hi, b64_, aux_hi, free):
            free_hi = free.astype(jnp.float64)
            A_hi = lambda u: free_hi * mv64.apply(free_hi * u, aux_hi) \
                + (1 - free_hi) * u
            return b64_ - A_hi(x_hi)

        t0 = time.time()
        x_hi = jnp.zeros_like(b64)
        total_inner = 0
        resref = 1.0
        for k in range(4):
            rv = resid_vec(x_hi, b64, aux64, free32)
            resref = float(jnp.linalg.norm(rv.ravel())
                           / jnp.linalg.norm(b64.ravel()))
            print(f"  pass {k}: emulated-f64 rel residual {resref:.3e}",
                  flush=True)
            if resref <= 1e-8:
                break
            out = solve32(rv.astype(jnp.float32), aux32, free32, d32)
            out.x.block_until_ready()
            total_inner += int(out.iterations)
            x_hi = x_hi + out.x.astype(jnp.float64)
        tref = time.time() - t0
        print(f"refined solve (host-level passes): {total_inner} total "
              f"inner iters, {tref:.1f} s, emulated-f64 rel residual "
              f"{resref:.3e}")
        print(f"refined/f32 cost ratio: {tref / max(t32, 1e-9):.2f}x")
        print("PASS" if resref <= 1e-8 else "FAIL",
              "(residual target 1e-8)")


if __name__ == "__main__":
    if os.environ.get("ORACLE_MODE"):
        oracle_main()
    else:
        main()
