"""Experiment: bf16 storage for the preconditioner's dense operands.

The preconditioner apply (1.66 ms) now outweighs the SpMV (1.22 ms); the
dense (nc, nc) coarse matvec streams ~42 MB/iteration at nc=3246. M only
affects the convergence rate — never the converged answer — so its dense
operands (coarse inverse, 8x8 block inverses) can be stored in bf16 with
f32 accumulation. This measures iteration count + wall-clock both ways.

Usage: python tools/exp_precond_bf16.py  (knobs: BENCH_H)
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
        BlockTwoLevel,
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

    base = jax.jit(lambda v, d: block_two_level_from_values(st, v, d))(values, diag)
    print(
        f"n_pad={st.n_pad} g={base.g} nc={base.coarse_inv.shape[0]}", flush=True
    )

    class BF16TwoLevel:
        """Same math as BlockTwoLevel; dense operands stored bf16."""

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

    variants = {
        "f32": base,
        "bf16": BF16TwoLevel(base),
        "bf16-coarse-only": BlockTwoLevel(
            inv_diag=base.inv_diag,
            coarse_inv=base.coarse_inv,  # placeholder, replaced below
            g=base.g,
            blk_inv=base.blk_inv,
        ),
    }

    class BF16CoarseOnly:
        def __init__(self, base):
            self.coarse_inv = base.coarse_inv.astype(jnp.bfloat16)
            self.blk_inv = base.blk_inv
            self.g = base.g

        def __call__(self, r):
            k = self.blk_inv.shape[-1]
            fine = jnp.einsum(
                "rij,rj->ri", self.blk_inv, r.reshape(-1, k)
            ).reshape(-1)
            r_c = r.reshape(-1, self.g).sum(axis=-1)
            z_c = jnp.matmul(
                self.coarse_inv,
                r_c.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            z = jnp.repeat(z_c, self.g, total_repeat_length=r.shape[0])
            return fine + z

    variants["bf16-coarse-only"] = BF16CoarseOnly(base)

    for name, M in variants.items():
        print(f"compiling {name}...", flush=True)
        solve = jax.jit(
            lambda M=M: pcg(
                lambda v: bsr_matvec(st, values, v),
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
        it = int(info.iterations)
        print(
            f"{name:18s} {t*1e3:8.1f} ms  {it:4d} iters  "
            f"{t/it*1e6:7.1f} us/iter  res={float(info.residual_norm):.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
