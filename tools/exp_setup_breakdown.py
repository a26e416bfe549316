"""Where does the benchmark's per-solve SETUP time go?

The captured 1.49 ms/iteration at h=0.03 is whole-wallclock/iters; the
in-jit iteration floor is ~1.1 ms, so ~28 ms/solve is setup. This times
the setup stages cumulatively, each as its own jit with a host-synced
output (axon needs a host copy to synchronize):

  assemble    local symmetric stiffness + rhs integrate
  scatter     + canonical-pair BSR value scatter
  smoother    + aggregate-block diagonal extraction + batched inverses
  coarse      + Galerkin coarse assembly (segment sums)
  coarse_inv  + the dense (nc, nc) inverse
  full        the complete assemble_and_solve at 0 iterations (tol huge)

Usage: python tools/exp_setup_breakdown.py  (knobs: BENCH_H, PROF_REPS)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = float(os.environ.get("BENCH_H", "0.03"))
REPS = int(os.environ.get("PROF_REPS", "20"))


def main():
    import jax
    import jax.numpy as jnp

    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.ops.bsr import (
        bsr_diagonal,
        bsr_reduce,
        bsr_values_from_local_symmetric,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.ops.precondition import (
        agg_block_two_level_from_values,
        build_agg_block_table,
        default_aggregate_size,
    )
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8, want_entry_slot=True)
    g = default_aggregate_size(st)
    gs = min(g, 128)
    agg_table = jnp.asarray(build_agg_block_table(st, gs))
    print(
        f"h={H}: {V.n_dofs} dofs, n_pad={st.n_pad}, g={g}, gs={gs}, "
        f"nc={st.n_pad // g}",
        file=sys.stderr,
    )

    a_form = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)

    big = {
        "bcols": st.bcols,
        "entry_slot": st.entry_slot,
        "entry_slot_sym": st.entry_slot_sym,
        "bcols2": st.bcols2,
        "heavy_rows": st.heavy_rows,
        "tpartner": st.tpartner,
    }
    device = jax.devices()[0]
    V_d, big_d, agg_d = jax.device_put((V, big, agg_table), device)

    def assemble(Vb, tables, agg):
        st_d = st._replace(**tables)
        local = Vb.integrate_bilinear_form_local(a_form)
        b = Vb.integrate_linear_form(lambda b_: b_.v)
        return local.sum(), b.sum()

    def scatter(Vb, tables, agg):
        st_d = st._replace(**tables)
        local = Vb.integrate_bilinear_form_local(a_form)
        v1, v2 = bsr_values_from_local_symmetric(st_d, local)
        return v1.sum() + v2.sum()

    def smoother(Vb, tables, agg):
        st_d = st._replace(**tables)
        local = Vb.integrate_bilinear_form_local(a_form)
        values = bsr_values_from_local_symmetric(st_d, local)
        diag = bsr_diagonal(st_d, values)
        pre = agg_block_two_level_from_values(
            st_d, values, diag, table=agg, skip_coarse=True
        )
        return pre(bsr_reduce(st_d, Vb.integrate_linear_form(lambda b_: b_.v))).sum()

    def full_pre(Vb, tables, agg):
        st_d = st._replace(**tables)
        local = Vb.integrate_bilinear_form_local(a_form)
        values = bsr_values_from_local_symmetric(st_d, local)
        diag = bsr_diagonal(st_d, values)
        pre = agg_block_two_level_from_values(st_d, values, diag, table=agg)
        return pre(bsr_reduce(st_d, Vb.integrate_linear_form(lambda b_: b_.v))).sum()

    stages = {"assemble": assemble, "scatter": scatter}
    # smoother-only needs a skip_coarse hook; probe for it
    import inspect

    if "skip_coarse" in inspect.signature(
        agg_block_two_level_from_values
    ).parameters:
        stages["smoother"] = smoother
    stages["full_precond"] = full_pre

    out = {}
    for name, fn in stages.items():
        jf = jax.jit(fn)
        r = jf(V_d, big_d, agg_d)
        np.asarray(r)  # sync
        t0 = time.perf_counter()
        for _ in range(REPS):
            r = jf(V_d, big_d, agg_d)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        out[name] = (time.perf_counter() - t0) / REPS
        print(f"  {name}: {out[name]*1e3:.2f} ms", file=sys.stderr, flush=True)

    print(json.dumps({"metric": "bench_setup_breakdown", "h": H, "ms": {
        k: v * 1e3 for k, v in out.items()}}))


if __name__ == "__main__":
    main()
