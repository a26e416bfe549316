"""Per-component timing of the seven-fractures BSR benchmark on the TPU.

Breaks the bench hot path into its pieces so we can see where the next
millisecond lives: assembly (local integrate + block scatter), SpMV,
preconditioner apply, and the full PCG iteration. Every measured op loops
inside one jitted program (loop-invariant gathers get hoisted on this
backend — the SpMV must consume the loop carry) and synchronizes with a
host copy (block_until_ready is a no-op on axon).

Usage: python tools/profile_bench.py  (knobs: BENCH_H, PROF_REPS)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = float(os.environ.get("BENCH_H", "0.03"))
REPS = int(os.environ.get("PROF_REPS", "50"))


def main():
    import jax
    import jax.numpy as jnp

    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.ops.bsr import (
        bsr_diagonal,
        bsr_matvec,
        bsr_reduce,
        bsr_values_from_local,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.ops.precondition import (
        auto_preconditioner,
    )
    from pytorch_fem_solver_tpu.ops.solvers import pcg
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    print(f"devices: {jax.devices()}", flush=True)
    t0 = time.perf_counter()
    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8)
    print(
        f"h={H} cells={mesh.n_cells} dofs={V.n_dofs} n_pad={st.n_pad} "
        f"nb={st.nb} B={st.bcols.shape[1]} build={time.perf_counter()-t0:.1f}s",
        flush=True,
    )

    def a_form(basis):
        return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)

    def l_form(basis):
        return basis.v

    def timed(name, fn, *args, reps=3):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(f"{name:34s} {t*1e3:9.2f} ms   ({t/REPS*1e6:8.1f} us/rep)", flush=True)
        return out, t

    # --- assembly: local integrate + one scatter (single shot, x REPS) ---
    @jax.jit
    def assemble_loop():
        def body(i, acc):
            local = V.integrate_bilinear_form_local(a_form)
            values = bsr_values_from_local(st, local)
            return acc + values[0][0, 0, 0, 0] + i * 0.0

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    timed("assembly (local+scatter)", assemble_loop)

    @jax.jit
    def local_only_loop():
        def body(i, acc):
            local = V.integrate_bilinear_form_local(a_form)
            return acc + local[0, 0, 0] + i * 0.0

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    timed("  local matrices only", local_only_loop)

    # one-time values for the solver pieces
    local = jax.jit(lambda: V.integrate_bilinear_form_local(a_form))()
    values = jax.jit(lambda l: bsr_values_from_local(st, l))(local)
    diag = bsr_diagonal(st, values)
    b = jax.jit(lambda: bsr_reduce(st, V.integrate_linear_form(l_form)))()

    # --- SpMV: gather from the carry so nothing hoists ---
    @jax.jit
    def spmv_loop(x0):
        def body(i, x):
            y = bsr_matvec(st, values, x)
            return y / (jnp.max(jnp.abs(y)) + 1.0)

        return jax.lax.fori_loop(0, REPS, body, x0)

    x0 = b / (jnp.max(jnp.abs(b)) + 1.0)
    timed("SpMV (bsr_matvec)", spmv_loop, x0)

    # --- preconditioner apply ---
    precond = jax.jit(lambda v, d: auto_preconditioner(V, st, v, d))(values, diag)

    @jax.jit
    def precond_loop(x0):
        def body(i, x):
            y = precond(x)
            return y / (jnp.max(jnp.abs(y)) + 1.0)

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("preconditioner apply", precond_loop, x0)

    # --- preconditioner numeric setup (once per assembly) ---
    @jax.jit
    def setup_loop(v, d):
        def body(i, acc):
            p = auto_preconditioner(V, st, v, d)
            return acc + p(b)[0]

        return jax.lax.fori_loop(0, 5, body, 0.0)

    out = setup_loop(values, diag)
    np.asarray(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(setup_loop(values, diag))
        ts.append(time.perf_counter() - t0)
    print(f"{'precond setup (x5)':34s} {np.median(ts)*1e3:9.2f} ms", flush=True)

    # --- full solve for reference ---
    @jax.jit
    def solve():
        precond = auto_preconditioner(V, st, values, diag)
        x, info = pcg(
            lambda v: bsr_matvec(st, values, v),
            b,
            precond=precond,
            tol=1e-6,
            maxiter=600,
        )
        return x, info.iterations

    (x, iters), t_solve = timed("full PCG solve", solve, reps=3)
    iters = int(iters)
    print(
        f"  {iters} iterations -> {t_solve/max(iters,1)*1e6:.1f} us/iteration",
        flush=True,
    )


if __name__ == "__main__":
    main()
