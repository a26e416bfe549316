"""Experiment: why does the (nc, nc) dense coarse matvec cost ~660 us?

42 MB of f32 at nc=3248 should stream in ~60-100 us on this HBM; measure
alternative formulations to find one XLA lowers at full bandwidth.

Usage: python tools/exp_coarse_matvec.py  (knobs: NC, PROF_REPS)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NC = int(os.environ.get("NC", "3248"))
REPS = int(os.environ.get("PROF_REPS", "200"))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((NC, NC)), dtype=jnp.float32)
    nc_pad = -(-NC // 128) * 128
    A_pad = jnp.zeros((nc_pad, nc_pad), jnp.float32).at[:NC, :NC].set(A)
    A_bf16 = A.astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal(NC), dtype=jnp.float32)

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
        gbs = NC * NC * (2 if "bf16" in name else 4) / (t / REPS) / 1e9
        print(f"{name:28s} {t/REPS*1e6:9.1f} us/op  ({gbs:6.0f} GB/s)", flush=True)

    def norm(y):
        return y / (jnp.max(jnp.abs(y)) + 1.0)

    def ein_ij_j(x):
        def body(i, x):
            return norm(jnp.einsum("ij,j->i", A, x))

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("einsum ij,j->i", ein_ij_j, x0)

    def ein_j_ji(x):
        def body(i, x):
            return norm(jnp.einsum("j,ji->i", x, A))

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("einsum j,ji->i (A^T form)", ein_j_ji, x0)

    def matmul_col(x):
        def body(i, x):
            return norm((A @ x[:, None])[:, 0])

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("A @ x[:, None]", matmul_col, x0)

    def matmul_row(x):
        def body(i, x):
            return norm((x[None, :] @ A)[0])

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("x[None, :] @ A", matmul_row, x0)

    def padded(x):
        xp = jnp.zeros((nc_pad,), jnp.float32)

        def body(i, x):
            y = jnp.einsum("ij,j->i", A_pad, xp.at[:NC].set(x))
            return norm(y[:NC])

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("padded-to-128 einsum", padded, x0)

    def bf16_op(x):
        def body(i, x):
            y = jnp.einsum(
                "ij,j->i", A_bf16, x.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return norm(y)

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("bf16 operand einsum", bf16_op, x0)

    def eight_rhs(x):
        # amortize: 8 simultaneous rhs (what a blocked CG would feed)
        X = jnp.stack([x] * 8, axis=1)

        def body(i, X):
            Y = A @ X
            return Y / (jnp.max(jnp.abs(Y)) + 1.0)

        return jax.lax.fori_loop(0, REPS, body, X)

    timed("A @ X (8 rhs, amortized)", eight_rhs, x0)


if __name__ == "__main__":
    main()
