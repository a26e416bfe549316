"""Pallas fused PCG step A/B (round-5 VERDICT item 4: settle the Pallas
question with one decisive measurement).

Prior rounds established (docs/performance.md): the SpMV gather cannot move
into Pallas (Mosaic rejects every in-kernel dynamic-gather formulation —
tools/exp_pallas_gather_probe.py), and the iteration splits as SpMV 845 us
(77%), dense coarse matvec ~230 us (XLA streams it at only ~190 GB/s),
everything else ~free. So the fusable region is the NON-gather tail of the
aggregate-block two-level iteration, restructured as two Pallas kernels
around the XLA SpMV:

  K1  x += alpha p ; r -= alpha ap ; s = D_agg^{-1} r (unrolled batched
      (gs x gs) matvec, static indexing only) ; rc = aggregate sums of r
  XLA d1 = dot(p, ap) (before K1), SpMV, p = z + beta p (after K2)
  K2  zc_tile = coarse_inv[rows] @ rc (MXU, rc resident in VMEM)
      z = s + broadcast(zc) ; rz2 = dot(r, z) (SMEM-accumulated across
      the sequential grid)

K2 carries the only real upside: if Pallas streams the (nc, nc) coarse
inverse near HBM bandwidth, the ~230 us coarse apply shrinks ~4x
(~15% of the iteration). K1 targets XLA op overhead only (measured ~free
— expect parity). Correctness is asserted against the stock pcg for the
same fixed iteration count before timing.

Usage: python tools/exp_pallas_fused_pcg.py   (knobs: BENCH_H, PROF_REPS,
       FUSED_TR row-tile, default 128)
Prints one JSON line with s/iteration for stock vs fused and the deltas.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H = float(os.environ.get("BENCH_H", "0.03"))
REPS = int(os.environ.get("PROF_REPS", "100"))
TR = int(os.environ.get("FUSED_TR", "128"))
# CPU validation path: interpret the kernels (no Mosaic) and skip timing
INTERPRET = bool(int(os.environ.get("FUSED_INTERPRET", "0")))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.ops.bsr import (
        bsr_diagonal,
        bsr_matvec,
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
    from pytorch_fem_solver_tpu.utils.watchdog import Watchdog, probe_device

    wd = Watchdog(metric="pallas_fused_pcg")
    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")
    else:
        rtt = probe_device(wd, 240.0)
        log(f"tunnel probe: {rtt:.1f}s")

    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    st = get_bsr_structure(V, max_b=8, want_entry_slot=False)

    a_form = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    local = jax.jit(lambda: V.integrate_bilinear_form_local(a_form))()
    values = jax.jit(lambda l: bsr_values_from_local_symmetric(st, l))(local)
    diag = jax.jit(lambda v: bsr_diagonal(st, v))(values)
    b = jax.jit(
        lambda: bsr_reduce(st, V.integrate_linear_form(lambda B: B.v)[:, 0])
    )()

    g = default_aggregate_size(st)
    gs = min(g, 128)
    table = jnp.asarray(build_agg_block_table(st, gs))
    precond = jax.jit(
        lambda v, d: agg_block_two_level_from_values(
            st, v, d, g=g, gs=gs, table=table
        )
    )(values, diag)
    inv_agg = precond.inv_agg  # (ns, gs, gs)
    coarse_inv = precond.coarse_inv  # (nc, nc)
    n_pad = st.n_pad
    ns = n_pad // gs
    nc = coarse_inv.shape[0]
    npc = n_pad // g  # fine aggregates per coarse unknown boundary
    assert g == gs and nc == ns, (g, gs, nc, ns)
    log(f"n_pad={n_pad} ns={ns} nc={nc} g={g} gs={gs} "
        f"dofs={V.n_dofs}")

    # --- padded 2D layouts -------------------------------------------------
    nsp = -(-ns // TR) * TR  # row tiles of TR aggregates
    ncp = -(-nc // 128) * 128  # lane-pad the coarse dimension
    inv_agg_p = jnp.pad(inv_agg, ((0, nsp - ns), (0, 0), (0, 0)))
    cinv_p = jnp.pad(coarse_inv, ((0, nsp - ns), (0, ncp - nc)))

    def to2d(v):
        return jnp.pad(v.reshape(ns, gs), ((0, nsp - ns), (0, 0)))

    def to1d(v2):
        return v2[:ns].reshape(-1)

    # --- K1: axpys + aggregate-block smoother + restriction ----------------
    def k1_kernel(alpha_ref, x_ref, r_ref, p_ref, ap_ref, inv_ref,
                  xn_ref, rn_ref, s_ref, rc_ref):
        alpha = alpha_ref[0, 0]
        p_t = p_ref[:]
        rn = r_ref[:] - alpha * ap_ref[:]
        xn_ref[:] = x_ref[:] + alpha * p_t
        rn_ref[:] = rn
        # unrolled batched (gs x gs) matvec: static slices only (Mosaic has
        # no dynamic gather); each term is a full-width VPU multiply-add
        s = inv_ref[:, :, 0] * rn[:, 0:1]
        for j in range(1, gs):
            s = s + inv_ref[:, :, j] * rn[:, j : j + 1]
        s_ref[:] = s
        rc_ref[:] = jnp.sum(rn, axis=1, keepdims=True)

    k1 = pl.pallas_call(
        k1_kernel,
        grid=(nsp // TR,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((TR, gs, gs), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((TR, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsp, gs), jnp.float32),
            jax.ShapeDtypeStruct((nsp, gs), jnp.float32),
            jax.ShapeDtypeStruct((nsp, gs), jnp.float32),
            jax.ShapeDtypeStruct((nsp, 1), jnp.float32),
        ],
        # the first on-hardware compile OOM'd the 16M scoped-vmem default
        # (the (TR, gs, gs) smoother-inverse block + 4-buffer pipeline);
        # raise the kernel's vmem budget explicitly
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=INTERPRET,
    )

    # --- K2: coarse matvec + prolong + additive combine + dot --------------
    def k2_kernel(cinv_ref, rc_ref, s_ref, rn_ref, z_ref, rz_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[0] = 0.0

        zc = jnp.dot(
            cinv_ref[:], rc_ref[0, :], preferred_element_type=jnp.float32
        )
        z = s_ref[:] + zc[:, None]
        z_ref[:] = z
        acc_ref[0] += jnp.sum(rn_ref[:] * z)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            rz_ref[0, 0] = acc_ref[0]

    k2 = pl.pallas_call(
        k2_kernel,
        grid=(nsp // TR,),
        in_specs=[
            pl.BlockSpec((TR, ncp), lambda i: (i, 0)),
            pl.BlockSpec((1, ncp), lambda i: (0, 0)),
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((TR, gs), lambda i: (i, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nsp, gs), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=INTERPRET,
    )

    def fused_body(state, _):
        x2, r2, p2, rz = state
        p1d = to1d(p2)
        ap = bsr_matvec(st, values, p1d)
        alpha = rz / jnp.dot(p1d, ap)
        xn, rn, s, rc = k1(
            alpha.reshape(1, 1), x2, r2, p2, to2d(ap), inv_agg_p
        )
        rc_row = jnp.pad(rc[:ns, 0], (0, ncp - nc))[None, :]
        z2, rz2 = k2(cinv_p, rc_row, s, rn)
        rz2 = rz2[0, 0]
        beta = rz2 / rz
        pn = z2 + beta * p2
        return (xn, rn, pn, rz2), None

    def stock_body(state, _):
        x, r, p, rz = state
        ap = bsr_matvec(st, values, p)
        alpha = rz / jnp.dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz2 = jnp.dot(r, z)
        beta = rz2 / rz
        p = z + beta * p
        return (x, r, p, rz2), None

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_stock(b, iters):
        r0 = b
        z0 = precond(r0)
        state = (jnp.zeros_like(b), r0, z0, jnp.dot(r0, z0))
        state, _ = jax.lax.scan(stock_body, state, None, length=iters)
        return state[0], state[1]

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_fused(b, iters):
        r0 = b
        z0 = precond(r0)
        state = (to2d(jnp.zeros_like(b)), to2d(r0), to2d(z0),
                 jnp.dot(r0, z0))
        state, _ = jax.lax.scan(fused_body, state, None, length=iters)
        return to1d(state[0]), to1d(state[1])

    # --- correctness: identical algebra for a fixed iteration budget -------
    wd.arm(900, "correctness (compile + 30 iters both paths)")
    xs, rs = run_stock(b, 30)
    xf, rf = run_fused(b, 30)
    xs, xf = np.asarray(xs), np.asarray(xf)
    scale = np.abs(xs).max()
    dx = float(np.abs(xf - xs).max() / scale)
    log(f"fused-vs-stock solution rel diff after 30 iters: {dx:.3e}")
    assert dx < 5e-5, dx
    if INTERPRET:
        print(json.dumps({"metric": "pallas_fused_pcg_interpret_ok",
                          "rel_diff_30it": dx}))
        return

    # --- timing -------------------------------------------------------------
    def time_it(fn):
        np.asarray(fn(b, REPS)[0])  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(b, REPS)[0])
            ts.append((time.perf_counter() - t0) / REPS)
        return float(np.median(ts))

    wd.arm(1800, "timing loops")
    s_stock = time_it(run_stock)
    s_fused = time_it(run_fused)
    wd.disarm()
    out = {
        "metric": "pallas_fused_pcg_s_per_iter",
        "h": H,
        "n_dofs": int(V.n_dofs),
        "n_pad": int(n_pad),
        "g": int(g),
        "reps": REPS,
        "stock_s_per_iter": s_stock,
        "fused_s_per_iter": s_fused,
        "speedup": s_stock / s_fused,
        "rel_diff_30it": dx,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
