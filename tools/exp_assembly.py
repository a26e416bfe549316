"""Measure full vs symmetric canonical-pair BSR assembly on the TPU.

Usage: python tools/exp_assembly.py  (knobs: BENCH_H, PROF_REPS)
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
        bsr_values_from_local,
        bsr_values_from_local_symmetric,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8)

    def a_form(basis):
        return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)

    local = jax.jit(lambda: V.integrate_bilinear_form_local(a_form))()
    print(f"T={local.shape[0]} n_pad={st.n_pad}", flush=True)

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
        print(f"{name:22s} {float(np.median(ts))/REPS*1e3:8.3f} ms/op", flush=True)

    def loop_full(l):
        def body(i, acc):
            v1, v2 = bsr_values_from_local(st, l * (1.0 + 0.0 * acc))
            return acc + v1[0, 0, 0, 0]

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    def loop_sym(l):
        def body(i, acc):
            v1, v2 = bsr_values_from_local_symmetric(st, l * (1.0 + 0.0 * acc))
            return acc + v1[0, 0, 0, 0]

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    def loop_scatter_only_sym(l):
        iu, ju = np.triu_indices(l.shape[-1])
        def body(i, acc):
            lm = l * (1.0 + 0.0 * acc)
            local_sym = jnp.stack(
                [lm[..., a, b] for a, b in zip(iu, ju)], axis=-1
            ).reshape(-1)
            v = (
                jnp.zeros((st.n_values,), dtype=local_sym.dtype)
                .at[st.entry_slot_sym]
                .add(local_sym, mode="drop")
            )
            return acc + v[0]

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    def loop_scatter_only_full(l):
        def body(i, acc):
            flat = (l * (1.0 + 0.0 * acc)).reshape(-1)
            v = (
                jnp.zeros((st.n_values,), dtype=flat.dtype)
                .at[st.entry_slot]
                .add(flat, mode="drop")
            )
            return acc + v[0]

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    timed("full assembly", loop_full, local)
    timed("symmetric assembly", loop_sym, local)
    timed("scatter only (9/el)", loop_scatter_only_full, local)
    timed("scatter only (6/el)", loop_scatter_only_sym, local)


if __name__ == "__main__":
    main()
