"""Experiment: Pallas P1 element kernel vs generic XLA local assembly.

Times, in jitted loops with carry-dependent inputs (so XLA cannot hoist):
  generic-local      integrate_bilinear_form_local(grad.grad) + f=1 load
  pallas-local       p1_local_stiffness_load_3d (SoA VPU kernel)
  xla-soa-local      same SoA math through plain XLA (isolates the layout
                     effect from the pallas effect)
  +sym-scatter       each of the above feeding bsr_values_from_local_symmetric

Usage: python tools/exp_element_assembly.py   (knobs: BENCH_H, PROF_REPS)
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
        bsr_values_from_local_symmetric,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.ops.pallas_kernels import (
        coords_to_soa_3d,
        _p1_pallas_3d,
        _p1_xla_3d,
    )
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8)
    T = mesh.n_cells
    print(f"h={H} cells={T} n_pad={st.n_pad}", flush=True)

    coords3d = jnp.asarray(mesh["cells", "coordinates_3d"])
    soa = coords_to_soa_3d(coords3d)

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
        print(f"{name:32s} {t/REPS*1e6:9.1f} us/op", flush=True)

    # carry: a scalar that the inputs are scaled by each iteration
    def generic_local(s0):
        def body(i, s):
            local = V.integrate_bilinear_form_local(
                lambda b: s * (b.v_grad @ jnp.matrix_transpose(b.v_grad))
            )
            load = V.integrate_linear_form_local(lambda b: s * b.v)
            return 1.0 + 0.0 * (local[0, 0, 0] + load[0, 0, 0])

        return jax.lax.fori_loop(0, REPS, body, s0)

    timed("generic-local (stiff+load)", generic_local, jnp.float32(1.0))

    def pallas_local(s0):
        def body(i, s):
            out = _p1_pallas_3d(soa * s)
            return 1.0 + 0.0 * out[0, 0]

        return jax.lax.fori_loop(0, REPS, body, s0)

    timed("pallas-local (SoA kernel)", pallas_local, jnp.float32(1.0))

    def xla_soa_local(s0):
        def body(i, s):
            out = _p1_xla_3d(soa * s)
            return 1.0 + 0.0 * out[0, 0]

        return jax.lax.fori_loop(0, REPS, body, s0)

    timed("xla-soa-local (same math)", xla_soa_local, jnp.float32(1.0))

    # downstream: local -> symmetric BSR values
    def generic_plus_scatter(s0):
        def body(i, s):
            local = V.integrate_bilinear_form_local(
                lambda b: s * (b.v_grad @ jnp.matrix_transpose(b.v_grad))
            )
            v1, v2 = bsr_values_from_local_symmetric(st, local)
            return 1.0 + 0.0 * v1[0, 0, 0, 0]

        return jax.lax.fori_loop(0, REPS, body, s0)

    timed("generic + sym-scatter", generic_plus_scatter, jnp.float32(1.0))

    def pallas_plus_scatter(s0):
        def body(i, s):
            out = _p1_pallas_3d(soa * s)
            local = out[:9, :T].T.reshape(T, 3, 3)
            v1, v2 = bsr_values_from_local_symmetric(st, local)
            return 1.0 + 0.0 * v1[0, 0, 0, 0]

        return jax.lax.fori_loop(0, REPS, body, s0)

    timed("pallas + sym-scatter", pallas_plus_scatter, jnp.float32(1.0))


if __name__ == "__main__":
    main()
