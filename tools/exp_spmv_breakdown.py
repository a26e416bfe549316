"""Experiment 4: where does the 1.22 ms BSR SpMV go?

Pieces measured in jitted loops (operands derived from the carry so XLA
cannot hoist them):
  gather-only      xb = x2[bcols]; cheap reduce
  einsum-only      y = einsum(v1, xb') with xb' carry-dependent, no gather
  full             bsr_matvec as shipped
  dot_general      batched (nb, 8, B*8) @ (nb, B*8) reformulation

Usage: python tools/exp_spmv_breakdown.py  (knobs: BENCH_H, PROF_REPS)
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
        bsr_matvec,
        bsr_reduce,
        bsr_values_from_local,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8)

    def a_form(basis):
        return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)

    local = jax.jit(lambda: V.integrate_bilinear_form_local(a_form))()
    values = jax.jit(lambda l: bsr_values_from_local(st, l))(local)
    v1, v2 = values
    b = jax.jit(lambda: bsr_reduce(st, V.integrate_linear_form(lambda B: B.v)))()
    x0 = b / (jnp.max(jnp.abs(b)) + 1.0)
    nb, B = st.bcols.shape
    k = st.block
    print(f"n_pad={st.n_pad} nb={nb} B={B} nnz_t1={nb*B*k*k}", flush=True)

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
        print(f"{name:26s} {t/REPS*1e6:9.1f} us/op", flush=True)

    def norm(y):
        return y / (jnp.max(jnp.abs(y)) + 1.0)

    def gather_only(x0):
        def body(i, x):
            x2 = x.reshape(nb, k)
            xb = x2[st.bcols]  # (nb, B, k)
            y = xb.sum(axis=1)  # (nb, k) cheap reduce
            return norm(y.reshape(-1))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("gather-only", gather_only, x0)

    def einsum_only(x0):
        def body(i, x):
            x2 = x.reshape(nb, k)
            # carry-dependent broadcast instead of a gather: every row uses
            # its own block replicated B times
            xb = jnp.broadcast_to(x2[:, None, :], (nb, B, k))
            y = jnp.einsum("rbij,rbj->ri", v1, xb)
            return norm(y.reshape(-1))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("einsum-only (no gather)", einsum_only, x0)

    def full(x0):
        def body(i, x):
            return norm(bsr_matvec(st, values, x))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("full bsr_matvec", full, x0)

    v1r = v1.transpose(0, 2, 1, 3).reshape(nb, k, B * k)  # (nb, 8, B*8)

    def dotgen(x0):
        def body(i, x):
            x2 = x.reshape(nb, k)
            xb = x2[st.bcols].reshape(nb, B * k)
            y = jax.lax.dot_general(
                v1r, xb, (((2,), (1,)), ((0,), (0,)))
            )  # (nb, 8)
            return norm(y.reshape(-1))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("dot_general batched", dotgen, x0)

    def mult_and_reduce(x0):
        def body(i, x):
            x2 = x.reshape(nb, k)
            xb = x2[st.bcols]
            y = (v1 * xb[:, :, None, :]).sum(axis=(1, 3))
            return norm(y.reshape(-1))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("mul+sum explicit", mult_and_reduce, x0)


if __name__ == "__main__":
    main()
