"""Experiment 5: Pallas BSR SpMV — gather x-blocks from VMEM-resident x.

The XLA SpMV is gather-dominated (696 of 754 us at 107k DOFs) and the
gather reads x from HBM per descriptor. x is only ~416 KB — it fits in
VMEM whole. This probes whether a Pallas kernel that keeps x resident and
gathers with jnp.take inside the kernel beats the XLA gather, streaming v1
tiles through VMEM via the grid.

Usage: python tools/exp_pallas_spmv.py  (knobs: BENCH_H, PROF_REPS)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = float(os.environ.get("BENCH_H", "0.03"))
REPS = int(os.environ.get("PROF_REPS", "100"))
TILE = int(os.environ.get("TILE", "512"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

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
    # pad nb to a TILE multiple; padded rows index block 0 with zero values
    nbp = -(-nb // TILE) * TILE
    v1p = jnp.pad(v1, ((0, nbp - nb), (0, 0), (0, 0), (0, 0)))
    bcolsp = jnp.pad(st.bcols, ((0, nbp - nb), (0, 0)))
    print(f"n_pad={st.n_pad} nb={nb} nbp={nbp} B={B}", flush=True)

    def kernel(bcols_ref, x_ref, v_ref, out_ref):
        cols = bcols_ref[...]  # (TILE, B) int32
        x = x_ref[...]  # (nb, k) resident
        xb = jnp.take(x, cols.reshape(-1), axis=0)  # (TILE*B, k)
        v = v_ref[...].reshape(TILE * B, k, k)
        y = (v * xb[:, None, :]).sum(axis=-1)  # (TILE*B, k)
        out_ref[...] = y.reshape(TILE, B, k).sum(axis=1)

    grid = (nbp // TILE,)

    @jax.jit
    def pallas_spmv(x):
        x2 = x.reshape(st.nb, k)
        y = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, B), lambda i: (i, 0)),
                pl.BlockSpec((st.nb, k), lambda i: (0, 0)),
                pl.BlockSpec((TILE, B, k, k), lambda i: (i, 0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, k), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((nbp, k), x.dtype),
        )(bcolsp, x2, v1p)
        y = y[:nb]
        if st.heavy_rows.shape[0]:
            y2 = jnp.einsum(
                "rbij,rbj->ri", v2, x2[st.bcols2], preferred_element_type=x.dtype
            )
            y = y.at[st.heavy_rows].add(
                y2, indices_are_sorted=True, unique_indices=True
            )
        return y.reshape(-1)

    # correctness first
    try:
        y_pl = np.asarray(pallas_spmv(x0))
    except Exception as e:
        print(f"pallas compile/run FAILED: {type(e).__name__}: {e}"[:2000])
        return
    y_ref = np.asarray(jax.jit(lambda x: bsr_matvec(st, values, x))(x0))
    err = np.abs(y_pl - y_ref).max() / (np.abs(y_ref).max() + 1e-30)
    print(f"pallas vs xla rel err: {err:.3e}", flush=True)

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

    def loop_pallas(x0):
        def body(i, x):
            return norm(pallas_spmv(x))

        return jax.lax.fori_loop(0, REPS, body, x0)

    def loop_xla(x0):
        def body(i, x):
            return norm(bsr_matvec(st, values, x))

        return jax.lax.fori_loop(0, REPS, body, x0)

    timed("pallas spmv", loop_pallas, x0)
    timed("xla spmv", loop_xla, x0)


if __name__ == "__main__":
    main()
