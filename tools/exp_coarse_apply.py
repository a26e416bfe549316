"""Experiment: decompose the coarse_apply cost (restrict/matvec/prolong).

Usage: python tools/exp_coarse_apply.py  (knobs: BENCH_H, PROF_REPS)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAD = int(os.environ.get("N_PAD", "103936"))
G = int(os.environ.get("G", "32"))
REPS = int(os.environ.get("PROF_REPS", "200"))


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    nc = N_PAD // G
    A = jnp.asarray(rng.standard_normal((nc, nc)), dtype=jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(N_PAD), dtype=jnp.float32)

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
        print(f"{name:28s} {t/REPS*1e6:9.1f} us/op", flush=True)

    def norm(y):
        return y / (jnp.max(jnp.abs(y)) + 1.0)

    def restrict_only(x):
        def body(i, x):
            r_c = x.reshape(-1, G).sum(axis=-1)
            return norm(jnp.repeat(r_c, G, total_repeat_length=N_PAD)) * 0 + norm(x)

        return jax.lax.fori_loop(0, REPS, body, x)

    def restrict_prolong(x):
        def body(i, x):
            r_c = x.reshape(-1, G).sum(axis=-1)
            return norm(jnp.repeat(r_c, G, total_repeat_length=N_PAD))

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("restrict+prolong (no mv)", restrict_prolong, x0)

    def full_coarse(x):
        def body(i, x):
            r_c = x.reshape(-1, G).sum(axis=-1)
            z_c = A @ r_c
            return norm(jnp.repeat(z_c, G, total_repeat_length=N_PAD))

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("restrict+matvec+prolong", full_coarse, x0)

    def mv_only_vec(x):
        # matvec on a carry-derived coarse vector, result prolonged cheaply
        def body(i, x):
            r_c = x[:nc]
            z_c = A @ r_c
            return norm(x.at[:nc].set(z_c))

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("matvec only (slice carry)", mv_only_vec, x0)

    def alt_prolong(x):
        # broadcast-reshape instead of jnp.repeat
        def body(i, x):
            r_c = x.reshape(-1, G).sum(axis=-1)
            z_c = A @ r_c
            z = jnp.broadcast_to(z_c[:, None], (nc, G)).reshape(-1)
            return norm(z)

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("broadcast-reshape prolong", alt_prolong, x0)

    def matmul_restrict(x):
        # restriction as a (nc, n_pad) matmul? no — as reshape + dot with
        # ones via einsum, fusable into the coarse matvec
        ones = jnp.ones((G,), jnp.float32)

        def body(i, x):
            r2 = x.reshape(nc, G)
            r_c = jnp.einsum("cg,g->c", r2, ones)
            z_c = A @ r_c
            z = jnp.broadcast_to(z_c[:, None], (nc, G)).reshape(-1)
            return norm(z)

        return jax.lax.fori_loop(0, REPS, body, x)

    timed("einsum restrict variant", matmul_restrict, x0)


if __name__ == "__main__":
    main()
