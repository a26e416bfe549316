"""On-chip mixed-precision iterative refinement (round-5 VERDICT item 5).

Runs ``compiled_refined_solver`` on the REAL TPU at the benchmark's DFN
scale: basis built on the x64 CPU host, f64 operator/rhs shipped once,
one jitted program per solve (f32 two-level PCG inner + f64 residual
recomputation — the f64 probe, tools/exp_f64_probe.py, measured every
residual-path op lowering on axon: axpy/dot/gather ~2x f32, the 8x8 block
einsum ~5x, no f64 scatter needed).

Success criterion (VERDICT): on-chip solution matching the x64 CPU solve
to ~1e-10 relative at ~100k DOFs with < 1.5x the f32-only time.

Usage: python tools/exp_refine_tpu.py   (knobs: REFINE_H default 0.03,
REFINE_PASSES default 2, REFINE_TOL32 default 1e-6)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_fem_solver_tpu.utils.watchdog import Watchdog, probe_device

H = float(os.environ.get("REFINE_H", "0.03"))
PASSES = int(os.environ.get("REFINE_PASSES", "2"))
TOL32 = float(os.environ.get("REFINE_TOL32", "1e-6"))
REPEATS = int(os.environ.get("REFINE_REPEATS", "3"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    wd = Watchdog(metric="refine_tpu")
    rtt = probe_device(wd, 240.0)
    log(f"tunnel probe: {rtt:.1f}s")

    from pytorch_fem_solver_tpu import config as fem_config

    # basis on the x64 CPU host (the refined solver's ground truth), then
    # the builder device_puts the f64 arrays to the TPU once
    with fem_config.setup_device_context():
        import pytorch_fem_solver_tpu as fem
        from pytorch_fem_solver_tpu.utils import build_benchmark_network

        mesh = build_benchmark_network(h=H)
        V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    log(f"mesh: h={H} {mesh.n_cells} cells, {V.n_dofs} DOFs "
        f"(dtype {V.v_grad.dtype})")

    a_form = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    l_form = lambda b: b.v

    from pytorch_fem_solver_tpu.ops import compiled_refined_solver

    # x64 CPU truth of the same discrete system
    wd.arm(900, "x64 CPU truth solve")
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        u_true, info_t = V.solve_iterative(
            V.integrate_bilinear_form_local(a_form),
            V.integrate_linear_form(l_form),
            tol=1e-12,
            precondition="two_level",
            return_info=True,
        )
        u_true = np.asarray(u_true)
    log(f"truth: {int(info_t.iterations)} its")

    results = {}
    for passes in (0, PASSES):
        wd.arm(900, f"build+warmup refine={passes}")
        solve = compiled_refined_solver(
            V, a_form, l_form, refine=passes, tol32=TOL32
        )
        t0 = time.perf_counter()
        u, info = solve()
        u_host = np.asarray(u)
        log(f"refine={passes}: warmup {time.perf_counter() - t0:.1f}s")
        times = []
        for _ in range(REPEATS):
            wd.arm(600, f"repeat refine={passes}")
            t0 = time.perf_counter()
            u, info = solve()
            u_host = np.asarray(u)
            times.append(time.perf_counter() - t0)
        err = float(
            np.abs(u_host - u_true).max() / np.abs(u_true).max()
        )
        results[f"refine{passes}"] = {
            "s": float(np.median(times)),
            "inner_iterations": np.asarray(info.inner_iterations).tolist(),
            "true_residuals": [
                float(r) for r in np.asarray(info.residuals)
            ],
            "rel_err_vs_x64": err,
        }
        log(f"refine={passes}: {np.median(times):.4f}s  "
            f"err vs x64 {err:.3e}  residuals "
            f"{[f'{float(r):.2e}' for r in np.asarray(info.residuals)]}")

    r = results[f"refine{PASSES}"]
    r0 = results["refine0"]
    out = {
        "metric": "refined_solve_tpu",
        "value": r["s"],
        "unit": "s",
        "detail": {
            "h": H,
            "n_dofs": int(V.n_dofs),
            "tol32": TOL32,
            "passes": PASSES,
            "f32_only_s": r0["s"],
            "overhead_x": r["s"] / max(r0["s"], 1e-12),
            **{k: v for k, v in results.items()},
        },
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
