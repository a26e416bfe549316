"""TPU measurement of the round-2 solver tier (VERDICT item 2).

Times, on the real (tunneled) chip, the compiled one-jit solvers that were
previously CPU-validated only:

  linear   compiled_solver, P1 Poisson, structured unit square ~100k DOFs
  newton   compiled_newton, -div((1+u^2) grad u) = f, same mesh
  eigsh    compiled_eigsh, k=6 Laplace eigenpairs, same mesh
  p3       compiled_solver, P3 Poisson (~100k DOFs at n=105)

Protocol matches bench.py: warmup (compile) then median of REPEATS runs,
host-copy sync (np.asarray — block_until_ready is a no-op on axon), a
watchdog converting a tunnel outage into a structured failure.

Usage: python tools/exp_solver_tier.py [linear newton eigsh p3]
Knobs: EXP_N (default 316), EXP_N_P3 (105), EXP_REPEATS (5).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_fem_solver_tpu.utils.watchdog import Watchdog, probe_device

N = int(os.environ.get("EXP_N", "316"))
N_P3 = int(os.environ.get("EXP_N_P3", "105"))
REPEATS = int(os.environ.get("EXP_REPEATS", "5"))
PI = math.pi


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed(wd, label, fn, warmup_s=600.0, repeat_s=240.0):
    wd.arm(warmup_s, f"{label} warmup (compile + first run)")
    t0 = time.perf_counter()
    out = fn()
    np.asarray(out[0])
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(REPEATS):
        wd.arm(repeat_s, f"{label} timed repeat")
        t0 = time.perf_counter()
        out = fn()
        np.asarray(out[0])
        times.append(time.perf_counter() - t0)
    wd.disarm()
    med = float(np.median(times))
    log(f"{label}: warmup {compile_s:.1f}s, times "
        f"{['%.4f' % t for t in times]} -> median {med:.4f}s")
    return med, out


def rhs(p):
    x, y = p[..., 0:1], p[..., 1:2]
    return 2 * PI**2 * jnp.sin(PI * x) * jnp.sin(PI * y)


def nonlinear_rhs(p):
    x, y = p[..., 0:1], p[..., 1:2]
    u = jnp.sin(PI * x) * jnp.sin(PI * y)
    ux = PI * jnp.cos(PI * x) * jnp.sin(PI * y)
    uy = PI * jnp.sin(PI * x) * jnp.cos(PI * y)
    return -(2 * u * (ux**2 + uy**2) + (1 + u**2) * (-2 * PI**2 * u))


def main():
    which = sys.argv[1:] or ["linear", "newton", "eigsh", "p3"]
    wd = Watchdog(metric="solver_tier_tpu")
    rtt = probe_device(wd, 240.0)
    log(f"tunnel probe: {rtt:.1f}s")

    results = {}

    mesh = fem.MeshTri(fem.rectangle(N, N))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    log(f"P1 mesh: {mesh.n_cells} cells, {V.n_dofs} dofs")

    def a_form(b):
        return b.v_grad @ jnp.matrix_transpose(b.v_grad)

    def l_form(b):
        return rhs(b.integration_points) * b.v

    def residual(b, u, ug):
        kappa = 1.0 + u**2
        return (
            kappa * (b.v_grad * ug).sum(-1, keepdims=True)
            - nonlinear_rhs(b.integration_points) * b.v
        )

    if "linear" in which:
        solve = V.compiled_solver(a_form, l_form, tol=1e-6)
        t, (u, info) = timed(wd, "linear", solve)
        results["linear"] = {
            "s": t, "iters": int(info.iterations), "n_dofs": int(V.n_dofs),
        }

    if "newton" in which:
        # f32 TPU: the assembly noise floor sits ~3e-5 relative (measured);
        # tol below that burns the Newton budget at the floor
        ntol = float(os.environ.get("EXP_NEWTON_TOL", "1e-4"))
        for pc in ("jacobi", "auto"):
            solve = V.compiled_newton(
                residual, tol=ntol, solve_tol=1e-6, precondition=pc
            )
            t, (u, (k, res, conv)) = timed(wd, f"newton[{pc}]", solve)
            results[f"newton_{pc}"] = {
                "s": t, "newton_steps": int(k), "res": float(res),
                "converged": bool(conv), "n_dofs": int(V.n_dofs),
            }

    if "eigsh" in which:
        def m_form(b):
            return b.v @ jnp.matrix_transpose(b.v)

        # EXP_EIGSH_METHOD: subspace (default) | lobpcg | both
        emeths = os.environ.get("EXP_EIGSH_METHOD", "subspace")
        emeths = ("lobpcg", "subspace") if emeths == "both" else (emeths,)
        for meth in emeths:
            solve = V.compiled_eigsh(
                a_form, m_form, k=6, tol=1e-5, solve_tol=1e-6, method=meth
            )
            t, (vals, vecs, info) = timed(wd, f"eigsh[{meth}]", solve)
            results[f"eigsh_{meth}" if len(emeths) > 1 else "eigsh"] = {
                "s": t, "rounds": int(info[0]),
                "vals": [float(v) for v in np.asarray(vals)],
                "n_dofs": int(V.n_dofs),
            }

    if "stokes" in which:
        from pytorch_fem_solver_tpu.ops import compiled_stokes_solver

        n_s = int(os.environ.get("EXP_N_STOKES", "115"))
        mesh_s = fem.MeshTri(fem.rectangle(n_s, n_s))
        Vu = fem.VectorBasis(mesh_s, fem.ElementTri(2, 4))
        Vp = fem.Basis(mesh_s, fem.ElementTri(1, 4))
        log(f"stokes mesh: {mesh_s.n_cells} cells, "
            f"{Vu.n_dofs} velocity + {Vp.n_dofs} pressure dofs")

        def visc(b):
            gr = b.v_grad
            return jnp.einsum("...icd,...jcd->...ij", gr, gr)

        def div_form(test_p, trial_u):
            div = jnp.trace(trial_u.v_grad, axis1=-2, axis2=-1)
            return -(test_p.v[..., 0][..., :, None] * div[..., None, :])

        def load(b):
            pts = b.integration_points[..., 0, :]
            f = jnp.stack(
                [jnp.sin(PI * pts[..., 0]), pts[..., 1] ** 2], axis=-1
            )
            return (b.v * f[..., None, :]).sum(-1, keepdims=True)

        f_vec = Vu.integrate_linear_form(load)
        # EXP_STOKES_METHOD: schur (default) | minres | both (A/B with
        # cross-method solution diff)
        methods = os.environ.get("EXP_STOKES_METHOD", "schur")
        methods = ("minres", "schur") if methods == "both" else (methods,)
        prev = None
        for meth in methods:
            solve = compiled_stokes_solver(
                Vu, Vp, visc, div_form, tol=1e-5, inner_tol=1e-6,
                inner_maxiter=400, method=meth,
            )
            t, (u, p, sinfo) = timed(wd, f"stokes[{meth}]",
                                     lambda: solve(f_vec),
                                     warmup_s=900.0, repeat_s=600.0)
            entry = {
                "s": t,
                "outer_iters": int(sinfo.outer_iterations),
                "converged": bool(sinfo.converged),
                "n_u": int(Vu.n_dofs), "n_p": int(Vp.n_dofs),
            }
            if prev is not None:
                u0, p0 = prev
                scale = float(np.abs(u0).max())
                entry["du_vs_prev"] = float(np.abs(np.asarray(u) - u0).max() / scale)
                entry["dp_vs_prev"] = float(np.abs(np.asarray(p) - p0).max())
            prev = (np.asarray(u), np.asarray(p))
            results[f"stokes_{meth}" if len(methods) > 1 else "stokes"] = entry

    if "p3" in which:
        mesh3 = fem.MeshTri(fem.rectangle(N_P3, N_P3))
        V3 = fem.Basis(mesh3, fem.ElementTri(3, 5))
        log(f"P3 mesh: {mesh3.n_cells} cells, {V3.n_dofs} dofs")
        solve = V3.compiled_solver(a_form, l_form, tol=1e-6)
        t, (u, info) = timed(wd, "p3", solve)
        results["p3"] = {
            "s": t, "iters": int(info.iterations), "n_dofs": int(V3.n_dofs),
        }

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: E402  (after watchdog exists)

    import pytorch_fem_solver_tpu as fem

    main()
