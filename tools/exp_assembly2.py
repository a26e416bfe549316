"""Isolate the symmetric-assembly overhead: pack, completion, halving.

Usage: python tools/exp_assembly2.py  (knobs: BENCH_H, PROF_REPS)
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
    from pytorch_fem_solver_tpu.ops.bsr import get_bsr_structure
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8)

    def a_form(basis):
        return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)

    local = jax.jit(lambda: V.integrate_bilinear_form_local(a_form))()
    n_loc = local.shape[-1]
    iu, ju = np.triu_indices(n_loc)
    w = jnp.asarray(np.where(iu == ju, 0.5, 1.0), dtype=local.dtype)
    k = st.block
    nb, B = st.bcols.shape

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
        print(f"{name:30s} {float(np.median(ts))/REPS*1e3:8.3f} ms/op", flush=True)

    def pack(lm):
        return (
            jnp.stack([lm[..., a, b] for a, b in zip(iu, ju)], axis=-1) * w
        ).reshape(-1)

    def scatter(local_sym):
        return (
            jnp.zeros((st.n_values,), dtype=local_sym.dtype)
            .at[st.entry_slot_sym]
            .add(local_sym, mode="drop")
        )

    def loop(fn):
        def run(l):
            def body(i, acc):
                out = fn(l * (1.0 + 0.0 * acc))
                return acc + out

            return jax.lax.fori_loop(0, REPS, body, 0.0)

        return run

    timed("pack only", loop(lambda lm: pack(lm)[0]), local)
    timed("pack+scatter", loop(lambda lm: scatter(pack(lm))[0]), local)

    values = jax.jit(lambda lm: scatter(pack(lm)))(local)

    def completion_a(v):
        blocks = v.reshape(-1, k, k)
        full = blocks + jnp.matrix_transpose(blocks[st.tpartner])
        return full[0, 0, 0]

    def completion_b(v):
        bt = jnp.matrix_transpose(v.reshape(-1, k, k))
        full = v.reshape(-1, k, k) + bt[st.tpartner]
        return full[0, 0, 0]

    def completion_c(v):
        # rows-of-64 gather, transpose via reshape on the gathered copy
        g = v.reshape(-1, k * k)[st.tpartner]
        full = v.reshape(-1, k, k) + g.reshape(-1, k, k).transpose(0, 2, 1)
        return full[0, 0, 0]

    timed("completion gather-then-T", loop(lambda vv: completion_a(vv)), values)
    timed("completion T-then-gather", loop(lambda vv: completion_b(vv)), values)
    timed("completion rows64", loop(lambda vv: completion_c(vv)), values)

    def full_sym_v2(lm):
        v = scatter(pack(lm))
        blocks = v.reshape(-1, k, k)
        full = blocks + jnp.matrix_transpose(blocks[st.tpartner])
        return full[0, 0, 0]

    timed("sym v2 total (no halving op)", loop(full_sym_v2), local)


if __name__ == "__main__":
    main()
