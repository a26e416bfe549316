"""Experiment 3: compose the exp2 winners.

mult two-level (V(1,1), 41 vs 82 iterations) costs 2 extra SpMVs per apply;
those inner SpMVs only shape the preconditioner, so they can run against a
bf16 *copy* of the operator (halves their streamed bytes). The outer PCG
matvec stays exact f32. All SpMVs use the own-block-slice split (saves nb
gather descriptors). Sweep g to rebalance the coarse level at the lower
iteration count.

Usage: python tools/exp_precond3.py  (knobs: BENCH_H)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = float(os.environ.get("BENCH_H", "0.03"))


def main():
    import jax
    import jax.numpy as jnp

    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.ops.bsr import (
        bsr_diagonal,
        bsr_reduce,
        bsr_values_from_local,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.ops.precondition import (
        block_two_level_from_values,
    )
    from pytorch_fem_solver_tpu.ops.solvers import pcg
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8)

    def a_form(basis):
        return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)

    local = jax.jit(lambda: V.integrate_bilinear_form_local(a_form))()
    values = jax.jit(lambda l: bsr_values_from_local(st, l))(local)
    diag = bsr_diagonal(st, values)
    b = jax.jit(lambda: bsr_reduce(st, V.integrate_linear_form(lambda B: B.v)))()
    values_bf16 = (
        values[0].astype(jnp.bfloat16),
        values[1].astype(jnp.bfloat16),
    )
    print(f"n_pad={st.n_pad} nb={st.nb}", flush=True)

    def matvec_split(v, x, out_dtype=None):
        v1, v2 = v
        od = out_dtype or x.dtype
        x2 = x.reshape(st.nb, st.block)
        xg = x2 if v1.dtype == x.dtype else x2.astype(v1.dtype)
        y = jnp.einsum("rij,rj->ri", v1[:, 0], xg, preferred_element_type=od)
        y = y + jnp.einsum(
            "rbij,rbj->ri",
            v1[:, 1:],
            xg[st.bcols[:, 1:]],
            preferred_element_type=od,
        )
        if st.heavy_rows.shape[0]:
            y2 = jnp.einsum(
                "rbij,rbj->ri", v2, xg[st.bcols2], preferred_element_type=od
            )
            y = y.at[st.heavy_rows].add(
                y2, indices_are_sorted=True, unique_indices=True
            )
        return y.reshape(-1)

    class Mult2Level:
        def __init__(self, base, inner_values):
            self.coarse_inv = base.coarse_inv.astype(jnp.bfloat16)
            self.blk_inv = base.blk_inv.astype(jnp.bfloat16)
            self.g = base.g
            self.inner_values = inner_values

        def smooth(self, r):
            k = self.blk_inv.shape[-1]
            return jnp.einsum(
                "rij,rj->ri",
                self.blk_inv,
                r.reshape(-1, k).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).reshape(-1)

        def coarse(self, r):
            r_c = r.reshape(-1, self.g).sum(axis=-1)
            z_c = jnp.matmul(
                self.coarse_inv,
                r_c.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return jnp.repeat(z_c, self.g, total_repeat_length=r.shape[0])

        def __call__(self, r):
            z = self.smooth(r)
            z = z + self.coarse(r - matvec_split(self.inner_values, z, jnp.float32))
            z = z + self.smooth(r - matvec_split(self.inner_values, z, jnp.float32))
            return z

    def run(name, M):
        print(f"compiling {name}...", flush=True)
        solve = jax.jit(
            lambda: pcg(
                lambda u: matvec_split(values, u),
                b,
                precond=M,
                tol=1e-6,
                maxiter=600,
            )
        )
        x, info = solve()
        np.asarray(x)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            x, info = solve()
            np.asarray(x)
            ts.append(time.perf_counter() - t0)
        t = float(np.median(ts))
        it = max(int(info.iterations), 1)
        print(
            f"{name:22s} {t*1e3:8.1f} ms  {int(info.iterations):4d} iters  "
            f"{t/it*1e6:7.1f} us/iter  res={float(info.residual_norm):.3e}",
            flush=True,
        )

    for g in (32, 64):
        base = jax.jit(
            lambda v, d, g=g: block_two_level_from_values(st, v, d, g=g)
        )(values, diag)
        run(f"mult-split-f32A-g{g}", Mult2Level(base, values))
        run(f"mult-split-bf16A-g{g}", Mult2Level(base, values_bf16))


if __name__ == "__main__":
    main()
