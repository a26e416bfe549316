"""Experiment 2: SpMV own-block slice, multiplicative two-level, g-sweep.

Variants measured on the seven-fractures benchmark system (PCG to 1e-6):
  spmv-split      tier-1 b=0 is always the own block — read it with a slice
                  instead of a gather (nb fewer descriptors/SpMV)
  mult-w{o}       symmetrized multiplicative two-level (V(1,1): damped
                  block-Jacobi pre/post smooth + exact coarse correction);
                  2 extra SpMVs per apply, candidate iff iters drop ~2.5x
  bf16-g{16,32,64} additive block two-level, bf16 dense operands, coarse
                  size sweep

Usage: python tools/exp_precond2.py  (knobs: BENCH_H)
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
        bsr_matvec,
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
    print(f"n_pad={st.n_pad} nb={st.nb}", flush=True)

    def matvec_split(v, x):
        v1, v2 = v
        x2 = x.reshape(st.nb, st.block)
        y = jnp.einsum("rij,rj->ri", v1[:, 0], x2)
        y = y + jnp.einsum(
            "rbij,rbj->ri", v1[:, 1:], x2[st.bcols[:, 1:]]
        )
        if st.heavy_rows.shape[0]:
            y2 = jnp.einsum("rbij,rbj->ri", v2, x2[st.bcols2])
            y = y.at[st.heavy_rows].add(
                y2, indices_are_sorted=True, unique_indices=True
            )
        return y.reshape(-1)

    def run(name, mv, M):
        print(f"compiling {name}...", flush=True)
        solve = jax.jit(
            lambda: pcg(lambda u: mv(u), b, precond=M, tol=1e-6, maxiter=600)
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
            f"{name:14s} {t*1e3:8.1f} ms  {int(info.iterations):4d} iters  "
            f"{t/it*1e6:7.1f} us/iter  res={float(info.residual_norm):.3e}",
            flush=True,
        )

    class BF16TwoLevel:
        def __init__(self, base):
            self.coarse_inv = base.coarse_inv.astype(jnp.bfloat16)
            self.blk_inv = base.blk_inv.astype(jnp.bfloat16)
            self.g = base.g

        def __call__(self, r):
            k = self.blk_inv.shape[-1]
            fine = jnp.einsum(
                "rij,rj->ri",
                self.blk_inv,
                r.reshape(-1, k).astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).reshape(-1)
            r_c = r.reshape(-1, self.g).sum(axis=-1)
            z_c = jnp.matmul(
                self.coarse_inv,
                r_c.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            z = jnp.repeat(z_c, self.g, total_repeat_length=r.shape[0])
            return fine + z

    base32 = jax.jit(lambda v, d: block_two_level_from_values(st, v, d, g=32))(
        values, diag
    )
    run("spmv-split", lambda u: matvec_split(values, u), base32)

    class Mult2Level:
        """Symmetrized multiplicative (V(1,1)) two-level, bf16 operands."""

        def __init__(self, base, mv, omega):
            self.coarse_inv = base.coarse_inv.astype(jnp.bfloat16)
            self.blk_inv = (omega * base.blk_inv).astype(jnp.bfloat16)
            self.g = base.g
            self.mv = mv

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
            z = z + self.coarse(r - self.mv(z))
            z = z + self.smooth(r - self.mv(z))
            return z

    mv0 = lambda u: bsr_matvec(st, values, u)
    for omega in (1.0, 0.7):
        run(f"mult-w{omega}", mv0, Mult2Level(base32, mv0, omega))

    for g in (16, 32, 64):
        baseg = jax.jit(
            lambda v, d, g=g: block_two_level_from_values(st, v, d, g=g)
        )(values, diag)
        run(f"bf16-g{g}", mv0, BF16TwoLevel(baseg))


if __name__ == "__main__":
    main()
