"""On-chip Stokes cost breakdown + config A/B (round-5 VERDICT item 2).

Measures, on the real TPU, where the compiled Schur-CG Stokes solve spends
its inner-PCG iterations (initial f-solve + Schur applications + velocity
recovery — the new ``StokesInfo.inner_total``) and A/Bs the candidate
economies against the round-4 default (1.47 s at 107k velocity DOFs):

  base     round-4 default: tol 1e-5, inner_tol 1e-6, eta 0.1, max 1e-2
  frelax   f_solve_tol=tol — the initial f-solve only feeds the Schur rhs
  eta      inner_eta=1.0 — looser relaxed inner tolerances throughout
  cap      inner_maxiter small (EXP_CAP, default 60) — hard-capped inner
           solves; the flexible outer CG absorbs the inexactness
  all      frelax + eta + cap combined

Each variant reports wall time, outer iterations, total inner iterations,
and solution error vs the tightest run (base at tol 1e-6 / inner 1e-8).

Usage: python tools/exp_stokes_breakdown.py [base frelax eta cap all]
Knobs: EXP_N_STOKES (115), EXP_REPEATS (3), EXP_CAP (60).
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

N_S = int(os.environ.get("EXP_N_STOKES", "115"))
REPEATS = int(os.environ.get("EXP_REPEATS", "3"))
CAP = int(os.environ.get("EXP_CAP", "60"))
PI = math.pi


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    which = sys.argv[1:] or ["base", "frelax", "eta", "cap", "all"]
    wd = Watchdog(metric="stokes_breakdown")
    rtt = probe_device(wd, 240.0)
    log(f"tunnel probe: {rtt:.1f}s")

    mesh = fem.MeshTri(fem.rectangle(N_S, N_S))
    Vu = fem.VectorBasis(mesh, fem.ElementTri(2, 4))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 4))
    log(f"mesh: {mesh.n_cells} cells, {Vu.n_dofs}u + {Vp.n_dofs}p dofs")

    def visc(b):
        gr = b.v_grad
        return jnp.einsum("...icd,...jcd->...ij", gr, gr)

    def div_form(test_p, trial_u):
        div = jnp.trace(trial_u.v_grad, axis1=-2, axis2=-1)
        return -(test_p.v[..., 0][..., :, None] * div[..., None, :])

    def load(b):
        pts = b.integration_points[..., 0, :]
        f = jnp.stack([jnp.sin(PI * pts[..., 0]), pts[..., 1] ** 2], axis=-1)
        return (b.v * f[..., None, :]).sum(-1, keepdims=True)

    f_vec = Vu.integrate_linear_form(load)

    configs = {
        "base": dict(tol=1e-5, inner_tol=1e-6, inner_maxiter=400),
        "frelax": dict(tol=1e-5, inner_tol=1e-6, inner_maxiter=400,
                       f_solve_tol=1e-5),
        "eta": dict(tol=1e-5, inner_tol=1e-6, inner_maxiter=400,
                    inner_eta=1.0),
        "cap": dict(tol=1e-5, inner_tol=1e-6, inner_maxiter=CAP),
        "all": dict(tol=1e-5, inner_tol=1e-6, inner_maxiter=CAP,
                    f_solve_tol=1e-5, inner_eta=1.0),
    }

    # truth: the tightest configuration (slow; one run)
    wd.arm(1200.0, "truth solve (compile + run)")
    # f32 on chip floors around ~1e-7 relative; 1e-6/1e-7 is as "true" as
    # the chip gets without burning maxiter at the float floor
    solve_t = compiled_stokes_solver(
        Vu, Vp, visc, div_form, tol=1e-6, inner_tol=1e-7, inner_maxiter=600
    )
    u_t, p_t, info_t = solve_t(f_vec)
    u_t, p_t = np.asarray(u_t), np.asarray(p_t)
    u_scale = float(np.abs(u_t).max())
    p_scale = float(np.abs(p_t).max())
    log(f"truth: outer={int(info_t.outer_iterations)} "
        f"inner_total={int(info_t.inner_total)}")
    wd.disarm()

    results = {}
    for name in which:
        kw = configs[name]
        solve = compiled_stokes_solver(Vu, Vp, visc, div_form, **kw)
        wd.arm(900.0, f"{name} warmup")
        t0 = time.perf_counter()
        u, p, sinfo = solve(f_vec)
        np.asarray(u)
        log(f"{name}: warmup {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(REPEATS):
            wd.arm(600.0, f"{name} repeat")
            t0 = time.perf_counter()
            u, p, sinfo = solve(f_vec)
            np.asarray(u)
            times.append(time.perf_counter() - t0)
        wd.disarm()
        med = float(np.median(times))
        entry = {
            "s": med,
            "outer": int(sinfo.outer_iterations),
            "inner_total": int(sinfo.inner_total),
            "inner_recovery": int(sinfo.inner_info.iterations),
            "s_per_inner": med / max(int(sinfo.inner_total), 1),
            "du_rel": float(np.abs(np.asarray(u) - u_t).max() / u_scale),
            "dp_rel": float(np.abs(np.asarray(p) - p_t).max() / p_scale),
            "converged": bool(sinfo.converged),
        }
        log(f"{name}: {json.dumps(entry)}")
        results[name] = entry

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    import jax.numpy as jnp  # noqa: E402

    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.ops import compiled_stokes_solver

    main()
