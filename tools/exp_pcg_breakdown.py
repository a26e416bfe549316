"""Experiment: where does the PCG iteration go at h=0.03?

In-jit fori_loop timings (carry-dependent, XLA cannot hoist):
  spmv-only          bsr_matvec alone
  spmv+vec           + the CG vector updates and dots (jacobi M)
  spmv+aggblock      + the aggregate-block fine smoother
  spmv+coarse        + the dense (nc, nc) coarse correction
  full-aggblock      the complete preconditioned iteration

Usage: python tools/exp_pcg_breakdown.py  (knobs: BENCH_H, PROF_REPS)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = float(os.environ.get("BENCH_H", "0.03"))
REPS = int(os.environ.get("PROF_REPS", "100"))


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
        agg_block_two_level_from_values,
    )
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8)

    def a_form(basis):
        return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)

    local = jax.jit(lambda: V.integrate_bilinear_form_local(a_form))()
    values = jax.jit(lambda l: bsr_values_from_local(st, l))(local)
    diag = jax.jit(lambda v: bsr_diagonal(st, v))(values)
    b = jax.jit(lambda: bsr_reduce(st, V.integrate_linear_form(lambda B: B.v)))()
    pre = jax.jit(
        lambda v, d: agg_block_two_level_from_values(st, v, d)
    )(values, diag)
    x0 = b / (jnp.max(jnp.abs(b)) + 1.0)
    nc = pre.coarse_inv.shape[0]
    print(f"n_pad={st.n_pad} nc={nc}", flush=True)

    def timed(name, loop_fn, *args):
        fn = jax.jit(loop_fn)
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        print(f"{name:20s} {t/REPS*1e6:9.1f} us/op", flush=True)

    def norm(y):
        return y / (jnp.max(jnp.abs(y)) + 1.0)

    def spmv_only(x0):
        def body(i, x):
            return norm(bsr_matvec(st, values, x))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("spmv-only", spmv_only, x0)

    inv_diag = 1.0 / jnp.where(diag != 0, diag, 1.0)

    def spmv_vec(c):
        def body(i, carry):
            x, r, p, rz = carry
            ap = bsr_matvec(st, values, p)
            alpha = rz / jnp.sum(p * ap)
            x = x + alpha * p
            r = r - alpha * ap
            z = inv_diag * r
            rz_new = jnp.sum(r * z)
            p = z + (rz_new / rz) * p
            return (x, norm(r), p, rz_new)

        return jax.lax.fori_loop(0, REPS, body, c)

    timed("spmv+vec (jacobi)", spmv_vec, (x0, b, b, jnp.sum(b * b)))

    def fine_apply(r):
        return jnp.einsum(
            "rij,rj->ri", pre.inv_agg, r.reshape(-1, pre.gs)
        ).reshape(-1)

    def coarse_apply(r):
        r_c = r.reshape(-1, pre.g).sum(axis=-1)
        z_c = pre.coarse_inv @ r_c
        return jnp.repeat(z_c, pre.g, total_repeat_length=r.shape[0])

    def spmv_fine(x0):
        def body(i, x):
            y = bsr_matvec(st, values, x)
            return norm(fine_apply(y))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("spmv+aggsmoother", spmv_fine, x0)

    def spmv_coarse(x0):
        def body(i, x):
            y = bsr_matvec(st, values, x)
            return norm(coarse_apply(y))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("spmv+coarse", spmv_coarse, x0)

    def full(c):
        def body(i, carry):
            x, r, p, rz = carry
            ap = bsr_matvec(st, values, p)
            alpha = rz / jnp.sum(p * ap)
            x = x + alpha * p
            r = r - alpha * ap
            z = pre(r)
            rz_new = jnp.sum(r * z)
            p = z + (rz_new / rz) * p
            return (x, norm(r), p, rz_new)

        return jax.lax.fori_loop(0, REPS, body, c)

    timed("full-aggblock", full, (x0, b, b, jnp.sum(b * b)))


if __name__ == "__main__":
    main()
