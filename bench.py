"""Benchmark: seven-fractures DFN assembly + Jacobi-PCG on TPU vs torch-CPU.

The BASELINE metric (/root/repo/BASELINE.json): assemble and solve the
seven-fractures DFN; target >= 10x a reference-style CPU implementation.
The reference publishes no numbers and ships no loader for this geometry
(SURVEY.md §6), so the baseline is an equivalent, *vectorized* torch-CPU
implementation of the same algorithm (local P1 stiffness assembly +
matrix-free Jacobi-PCG via index_add_) — a stronger baseline than the
reference's dense ``torch.zeros(n, n)`` + ``torch.linalg.solve`` path, which
cannot even represent the benchmark sizes (dense n^2 would need tens of GB).

Protocol: fixed PCG iteration count on both sides (same math, same flops),
f32 both sides. Prints ONE JSON line with the TPU wall-clock and the
CPU/TPU ratio.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

H = float(os.environ.get("BENCH_H", "0.03"))
CPU_THREADS = int(os.environ.get("BENCH_CPU_THREADS", str(os.cpu_count() or 8)))
CPU_REPEATS = int(os.environ.get("BENCH_CPU_REPEATS", "5"))
SKIP_CPU = bool(int(os.environ.get("BENCH_SKIP_CPU", "0")))  # envelope runs
PCG_ITERS = int(os.environ.get("BENCH_PCG_ITERS", "600"))  # iteration cap
TOL = float(os.environ.get("BENCH_TOL", "1e-6"))  # relative residual target
REPEATS = int(os.environ.get("BENCH_REPEATS", "5"))
MAX_K = int(os.environ.get("BENCH_MAX_K", "8"))
MAX_B = int(os.environ.get("BENCH_MAX_B", "8"))  # tier-1 block cap (bsr format)
PRECOND = os.environ.get("BENCH_PRECOND", "aggblock")
# aggblock (default: aggregate-block smoother + coarse, measured fastest at
# 107k-437k DOFs: 72/116/167 iterations vs two_level's 82/148/224) |
# two_level | mult | mult3 | three_level | affine | auto | smoothed | jacobi
# storage dtype of the preconditioner's dense operands (f32 | bf16): bf16
# halves the coarse-matvec HBM traffic at identical iterations on the 107k
# problem, but collapses the cycle at h=0.02 (147 -> 464 iterations) — the
# coarse correction's accuracy floor must track 1/cond(A). f32 default.
PRECOND_DTYPE = os.environ.get("BENCH_PRECOND_DTYPE", "f32")
FORMAT = os.environ.get("BENCH_FORMAT", "bsr")  # bsr | ell
# SoA P1-stiffness assembly (default on): compute the 6 canonical-pair
# entries in (6, T) layout — trailing dim T tiles perfectly, where the
# generic (T, q, 3, 3) integrand pads its tiny trailing dims ~14x.
# Measured 5.5 -> 1.4 ms at h=0.03 (tools/ probe 2026-08-19); exact for
# P1 (constant gradients), falls back to the generic closure path when 0.
SOA = bool(int(os.environ.get("BENCH_SOA", "1")))
OMEGA = float(os.environ.get("BENCH_OMEGA", "0.8"))
AGG = int(os.environ.get("BENCH_AGG", "0")) or None  # None = adaptive
AGG_SMOOTH = int(os.environ.get("BENCH_AGG_SMOOTH", "0")) or None  # aggblock gs
# Fail-fast deadlines (s): the axon tunnel's outage mode hangs every device
# touch in a silent sleep-retry loop; without these, an outage converts to
# rc=124 with no output (BENCH_r02.json). 0 disables.
PROBE_S = float(os.environ.get("BENCH_PROBE_S", "240"))  # init RTT 60-145s measured
WARMUP_S = float(os.environ.get("BENCH_WARMUP_S", "600"))
REPEAT_S = float(os.environ.get("BENCH_REPEAT_S", "180"))

from pytorch_fem_solver_tpu.utils.watchdog import Watchdog, probe_device

WD = Watchdog(metric="seven_fractures_dfn_assembly_pcg_wallclock")


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def build_mesh():
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    t0 = time.perf_counter()
    mesh = build_benchmark_network(h=H)
    log(
        f"mesh: h={H} cells={mesh.n_cells} global_dofs={mesh.n_global_dofs} "
        f"build={time.perf_counter() - t0:.1f}s"
    )
    return mesh


def timed_solve(assemble_and_solve):
    """Shared warmup + repeat protocol: median of host-synced wall-clocks.

    np.asarray forces real synchronization on axon (block_until_ready is a
    no-op there); the warmup also reports convergence.
    """
    if WARMUP_S:
        WD.arm(WARMUP_S, "tpu warmup (compile + first solve)")
    x, iters, res = assemble_and_solve()
    x_host = np.asarray(x)
    log(f"tpu warmup: converged in {int(iters)} iters, rel res {float(res):.3e}")

    times = []
    for _ in range(REPEATS):
        if REPEAT_S:
            WD.arm(REPEAT_S, "tpu timed repeat")
        t0 = time.perf_counter()
        x, iters, res = assemble_and_solve()
        x_host = np.asarray(x)
        times.append(time.perf_counter() - t0)
    WD.disarm()
    tpu_time = float(np.median(times))
    spread = (float(np.min(times)), float(np.max(times)))
    log(f"tpu times: {['%.4f' % t for t in times]} -> median {tpu_time:.4f}s")
    return tpu_time, float(res), int(iters), x_host, spread


def _pad_scatter_map(st, n_dofs):
    """Host map dof -> position in the padded reduced vector (boundary and
    eliminated DOFs -> n_pad, one past the end, for OOB-drop scatters)."""
    from pytorch_fem_solver_tpu.ops.bsr import inverse_inner_perm

    return inverse_inner_perm(st, n_dofs)


def tpu_run_bsr(mesh):
    """BSR path: hybrid block row-gather SpMV + block-Jacobi/aggregate M.

    Row gathers cost ~3.5 ns/index vs ~7.6 ns per scalar index on this TPU,
    so the 8x8-block layout (ops.bsr) is ~6x cheaper per SpMV than ELL;
    heavy (fracture-trace) block-rows spill past MAX_B into a small second
    tier. The preconditioner transfers are reshapes (zero gathers) and the
    fine smoother is a batched 8x8 block-Jacobi.
    """
    import jax
    import jax.numpy as jnp

    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.ops.bsr import (
        bsr_diagonal,
        bsr_matvec,
        bsr_reduce,
        bsr_values_from_local_symmetric,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.ops.precondition import (
        block_two_level_from_values,
        smoothed_two_level_matrix_free,
    )
    from pytorch_fem_solver_tpu.ops.solvers import pcg

    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    t0 = time.perf_counter()
    st = get_bsr_structure(V, max_b=MAX_B)
    log(
        f"bsr: n_pad={st.n_pad} nb={st.nb} B={st.bcols.shape[1]} "
        f"spill_rows={st.heavy_rows.shape[0]} "
        f"({time.perf_counter() - t0:.1f}s host, one-time)"
    )

    def a_form(basis):
        return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)

    def l_form(basis):
        return basis.v

    operand_dtype = jnp.bfloat16 if PRECOND_DTYPE == "bf16" else None

    # Constants-vs-arguments split (measured): the per-ITERATION gather
    # tables (bcols/bcols2/heavy_rows, ~nb*B entries) must stay jit
    # CONSTANTS — passing them as arguments cost 3.5x per PCG iteration
    # (1.7 -> 6.0 ms at 107k DOFs; XLA specializes constant gather
    # descriptors). The huge one-shot tables (entry_slot_sym ~ 6T entries,
    # used once per solve) and the basis arrays are passed as ARGUMENTS:
    # as closure constants they blow the serialized compile payload past
    # the axon remote-compile body limit at the 2M-DOF scale (HTTP 413).
    big_tables = {
        "bcols": st.bcols,
        "entry_slot": st.entry_slot,
        "entry_slot_sym": st.entry_slot_sym,
        "bcols2": st.bcols2,
        "heavy_rows": st.heavy_rows,
        "tpartner": st.tpartner,
        # transposed canonical-pair slots for the SoA (6, T) assembly
        "slots_T": jnp.asarray(
            np.asarray(st.entry_slot_sym).reshape(-1, 6).T.reshape(-1)
        ),
        # transposed per-cell DOF ids for the SoA (3, T) rhs scatter,
        # pre-mapped through the inverse inner permutation so the scatter
        # lands directly in the padded reduced layout (boundary DOFs ->
        # n_pad, dropped by the OOB scatter mode) — skips the separate
        # (n_dofs,) materialization + inner_perm gather of bsr_reduce
        "dofs_pad_T": jnp.asarray(
            _pad_scatter_map(st, V.n_dofs)[
                np.asarray(V._global_dofs4elements).T.reshape(-1)
            ]
        ),
    }
    agg_table = None
    if PRECOND == "aggblock":
        from pytorch_fem_solver_tpu.ops.precondition import (
            build_agg_block_table,
            default_aggregate_size,
        )

        g_eff = AGG or default_aggregate_size(st)
        gs_eff = AGG_SMOOTH or min(g_eff, 128)
        agg_table = jnp.asarray(build_agg_block_table(st, gs_eff))

    # chunked symmetric stiffness assembly above ~2.5M cells: the fused
    # (T, n_loc, n_loc) local-matrix temp lives in a (…, 3, 3)-tiled layout
    # the TPU pads ~57x — 7.6 GB at 4M cells (measured OOM at 2M DOFs).
    # Streaming the canonical-pair scatter over cell chunks caps the temp
    # at chunk size; the mirror completion runs once at the end.
    CHUNK = int(os.environ.get("BENCH_ASM_CHUNK", str(1 << 18)))
    n_cells_total = int(mesh.n_cells)
    chunk_xs = None
    iu, ju = np.triu_indices(3)
    if n_cells_total > 2_500_000:
        f_t = np.asarray(V.v_grad).dtype
        pad_c = (-n_cells_total) % CHUNK
        nchunks = (n_cells_total + pad_c) // CHUNK
        vg0 = np.pad(
            np.asarray(V.v_grad)[:, 0], ((0, pad_c), (0, 0), (0, 0))
        )
        dxs = np.pad(
            np.asarray(V._dx).sum(axis=1)[:, 0, 0], (0, pad_c)
        )
        es = np.pad(
            np.asarray(st.entry_slot_sym).reshape(n_cells_total, 6),
            ((0, pad_c), (0, 0)),
            constant_values=st.n_values,  # dropped by the OOB scatter mode
        )
        d = vg0.shape[-1]
        chunk_xs = {
            "vg": jnp.asarray(vg0.reshape(nchunks, CHUNK, 3, d), dtype=f_t),
            "dxs": jnp.asarray(dxs.reshape(nchunks, CHUNK), dtype=f_t),
            "slots": jnp.asarray(es.reshape(nchunks, CHUNK * 6)),
        }
        log(f"chunked assembly: {nchunks} chunks of {CHUNK} cells")

    # one-time transfer: basis arrays are host-committed (HostConstructed);
    # passing them as jit arguments without this re-ships them over the
    # axon tunnel on EVERY call (measured +0.21 s/solve at 107k DOFs)
    device = jax.devices()[0]
    if WARMUP_S:
        WD.arm(WARMUP_S, "one-time host->device transfer")
    V, big_tables, agg_table, chunk_xs = jax.device_put(
        (V, big_tables, agg_table, chunk_xs), device
    )

    @jax.jit
    def assemble_and_solve(V, tables, agg_table, chunk_xs):
        st_d = st._replace(
            **{
                k: v
                for k, v in tables.items()
                if k not in ("slots_T", "dofs_pad_T")
            }
        )
        b = None
        if SOA:
            # rhs in SoA: r (3, T) = v^T (3, q) @ dx^T (q, T) — one tiny
            # transposed matmul with the cell axis trailing (perfectly
            # tiled), then one 645k-element scatter straight into the
            # padded reduced layout (dofs_pad_T, boundary rows dropped
            # OOB) — no (n_dofs,) intermediate, no bsr_reduce gather.
            # precision=HIGHEST: TPU matmuls default to bf16 multiplies,
            # which perturbs b by ~4e-3 relative and showed up as a
            # tolerance-INDEPENDENT 3.06e-3 solution parity defect vs the
            # f64 CPU baseline (A/B 2026-08-19; the known bf16-matmul
            # failure class of docs/performance.md)
            r3 = jnp.matmul(
                V.v[..., 0].T,
                V._dx[:, :, 0, 0].T,
                precision=jax.lax.Precision.HIGHEST,
            )
            b_pad = (
                jnp.zeros((st.n_pad,), dtype=r3.dtype)
                .at[tables["dofs_pad_T"]]
                .add(r3.reshape(-1), mode="drop")
            )
        else:
            b = V.integrate_linear_form(l_form)
        # the stiffness form is symmetric: canonical-pair assembly scatters
        # 6 entries per element instead of 9 (scatters charge per element)
        if chunk_xs is None and SOA:
            from pytorch_fem_solver_tpu.ops.bsr import (
                bsr_complete_symmetric,
            )

            # (6, T) canonical-pair entries: one transpose pass of the
            # constant P1 gradients, then a perfectly-tiled elementwise
            # product — the scatter consumes the transposed slot table
            # (same entries, reordered indices, zero extra cost)
            vgT = V.v_grad[:, 0].transpose(1, 2, 0)  # (3, d, T)
            dxs = V._dx.sum(axis=1)[:, 0, 0]  # (T,)
            w6 = jnp.asarray(
                np.where(iu == ju, 0.5, 1.0), dtype=dxs.dtype
            )
            e6 = (vgT[iu] * vgT[ju]).sum(1) * dxs * w6[:, None]
            vals = (
                jnp.zeros((st.n_values,), dtype=e6.dtype)
                .at[tables["slots_T"]]
                .add(e6.reshape(-1), mode="drop")
            )
            values = bsr_complete_symmetric(st_d, vals)
        elif chunk_xs is None:
            local = V.integrate_bilinear_form_local(a_form)
            values = bsr_values_from_local_symmetric(st_d, local)
        else:
            from pytorch_fem_solver_tpu.ops.bsr import (
                bsr_complete_symmetric,
            )

            f_dt = b_pad.dtype if b is None else b.dtype
            w = jnp.asarray(np.where(iu == ju, 0.5, 1.0), dtype=f_dt)

            def chunk_body(vals, xs):
                g, dxs_c, slots = xs["vg"], xs["dxs"], xs["slots"]
                e = (g[:, iu, :] * g[:, ju, :]).sum(-1) * dxs_c[:, None] * w
                return vals.at[slots].add(e.reshape(-1), mode="drop"), None

            vals0 = jnp.zeros((st.n_values,), dtype=f_dt)
            vals, _ = jax.lax.scan(chunk_body, vals0, chunk_xs)
            values = bsr_complete_symmetric(st_d, vals)
        diag = bsr_diagonal(st_d, values)
        if b is not None:
            b_pad = bsr_reduce(st_d, b)
        if PRECOND in ("two_level", "smoothed", "three_level", "auto", "mult", "mult3", "affine", "aggblock"):
            if PRECOND == "aggblock":
                # aggregate-sized (g x g) diagonal-block smoother: resolves
                # all intra-aggregate coupling exactly, same coarse level,
                # still zero gathers per iteration (host-built table passed
                # as a jit argument, see big_tables above)
                from pytorch_fem_solver_tpu.ops.precondition import (
                    agg_block_two_level_from_values,
                )

                precond = agg_block_two_level_from_values(
                    st_d, values, diag, g=AGG, gs=AGG_SMOOTH,
                    table=agg_table, operand_dtype=operand_dtype,
                )
            elif PRECOND == "mult":
                # symmetrized multiplicative V(1,1) cycle: half the
                # iterations of the additive combination for 2 extra
                # (optionally bf16) SpMVs per apply
                from pytorch_fem_solver_tpu.ops.precondition import (
                    mult_two_level_from_values,
                )

                # inner SpMVs stay f32: bf16 inner copies save nothing (the
                # gather is dtype-independent) and collapse the cycle's
                # quality at h<=0.02 (233 vs ~75 iterations)
                precond = mult_two_level_from_values(
                    st_d, values, diag, g=AGG, operand_dtype=operand_dtype
                )
            elif PRECOND == "affine":
                # per-aggregate [1, x, y, z] coarse space (orthonormalized):
                # ~2x fewer iterations at equal g, parity at equal coarse
                # size for scalar Poisson — kept for vector problems
                from pytorch_fem_solver_tpu.ops.precondition import (
                    affine_two_level_from_values,
                    get_affine_two_level_structure,
                )

                ast = get_affine_two_level_structure(V, st, g=AGG)
                precond = affine_two_level_from_values(
                    ast, st_d, values, diag, operand_dtype=operand_dtype
                )
            elif PRECOND == "mult3":
                from pytorch_fem_solver_tpu.ops.precondition import (
                    get_three_level_structure,
                    mult_three_level_from_values,
                )

                tl3 = get_three_level_structure(V, st)
                precond = mult_three_level_from_values(
                    tl3, st_d, values, diag, operand_dtype=operand_dtype
                )
            elif PRECOND == "three_level":
                # sparse-coarse additive 3-level: the scalable choice once
                # the dense coarse level would exceed ~4096 unknowns
                from pytorch_fem_solver_tpu.ops.precondition import (
                    get_three_level_structure,
                    three_level_from_values,
                )

                tl3 = get_three_level_structure(V, st)
                precond = three_level_from_values(
                    tl3, st_d, values, diag, operand_dtype=operand_dtype
                )
            elif PRECOND == "auto":
                from pytorch_fem_solver_tpu.ops.precondition import (
                    auto_preconditioner,
                )

                precond = auto_preconditioner(
                    V, st_d, values, diag, operand_dtype=operand_dtype
                )
            elif PRECOND == "smoothed":
                # matrix-free smoothed aggregation: fewest iterations, but
                # two extra SpMVs per iteration — loses to the plain coarse
                # correction once the SpMV is the dominant cost
                precond = smoothed_two_level_matrix_free(
                    st_d, values, diag, g=AGG, omega=OMEGA
                )
            else:
                # block-Jacobi fine + aggregate coarse: 1 SpMV/iteration
                precond = block_two_level_from_values(
                    st_d, values, diag, g=AGG, operand_dtype=operand_dtype
                )
            x, info = pcg(
                lambda v: bsr_matvec(st_d, values, v),
                b_pad,
                precond=precond,
                tol=TOL,
                maxiter=PCG_ITERS,
            )
        else:
            x, info = pcg(
                lambda v: bsr_matvec(st_d, values, v),
                b_pad,
                precond_diag=diag,
                tol=TOL,
                maxiter=PCG_ITERS,
            )
        rel = info.residual_norm / jnp.sqrt(jnp.sum(b_pad * b_pad))
        return x, info.iterations, rel

    tpu_time, res, iters, x_host, spread = timed_solve(
        lambda: assemble_and_solve(V, big_tables, agg_table, chunk_xs)
    )
    try:  # HBM headroom for the scale envelope (axon may not expose it)
        stats = jax.local_devices()[0].memory_stats()
        log(
            f"hbm: in_use={stats.get('bytes_in_use', 0)/2**30:.2f} GiB "
            f"peak={stats.get('peak_bytes_in_use', 0)/2**30:.2f} GiB "
            f"limit={stats.get('bytes_limit', 0)/2**30:.2f} GiB"
        )
    except Exception:
        pass
    x_full = np.zeros(V.n_dofs, dtype=np.float64)
    x_full[st.inner_perm] = x_host[: st.n_inner].astype(np.float64)
    return tpu_time, res, iters, x_full, spread


def tpu_run(mesh):
    import jax
    import jax.numpy as jnp

    import pytorch_fem_solver_tpu as fem

    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))

    def a_form(basis):
        return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)

    def l_form(basis):
        return basis.v

    n = V.n_dofs
    inner = V._basis_parameters["inner_dofs"]

    # scatter-free ELL layout for the PCG hot loop (host-built once)
    from pytorch_fem_solver_tpu.ops.sparse import (
        build_ell_structure,
        ell_diagonal,
        ell_matvec,
        ell_values_from_local,
    )

    from pytorch_fem_solver_tpu.ops.solvers import pcg

    structure = build_ell_structure(
        np.asarray(V._global_dofs4elements), n, np.asarray(inner), max_k=MAX_K
    )
    log(
        f"ell: n_inner={structure.n_inner} K={structure.cols.shape[1]} "
        f"spill={structure.spill_rows.shape[0]}"
    )

    # value-independent preconditioner structure: host-built once per basis
    # (like the ELL layout itself); all value-dependent setup runs on device
    # inside the timed jit
    tl = None
    if PRECOND == "two_level":
        from pytorch_fem_solver_tpu.ops.precondition import (
            build_two_level_structure,
            two_level_from_values,
        )

        coords = np.asarray(V._coords4global_dofs)[np.asarray(inner)]
        t0 = time.perf_counter()
        tl = build_two_level_structure(structure, coords, leaf=32, kp=4)
        log(
            f"two-level structure: nc={tl.nc} "
            f"({time.perf_counter() - t0:.2f}s host, one-time)"
        )

    @jax.jit
    def assemble_and_solve():
        local = V.integrate_bilinear_form_local(a_form)
        b = V.integrate_linear_form(l_form)
        values = ell_values_from_local(structure, local)
        diag = ell_diagonal(structure, values)
        b_red = V.reduce(b)[..., 0]
        if tl is not None:
            precond = two_level_from_values(tl, structure, values, diag)
        else:
            precond = None
        x, info = pcg(
            lambda xr: ell_matvec(structure, values, xr),
            b_red,
            precond_diag=diag,
            precond=precond,
            tol=TOL,
            maxiter=PCG_ITERS,
        )
        return x, info.iterations, info.residual_norm / jnp.sqrt(
            jnp.sum(b_red * b_red)
        )

    tpu_time, res, iters, x_host, spread = timed_solve(assemble_and_solve)
    x_full = np.zeros(n, dtype=np.float64)
    x_full[np.asarray(inner)] = x_host.astype(np.float64)
    return tpu_time, res, iters, x_full, spread


def cpu_baseline(mesh):
    """Reference-style torch-CPU: vectorized local assembly + Jacobi-PCG.

    Pinned protocol: BENCH_CPU_THREADS (default all cores), median of
    BENCH_CPU_REPEATS runs with the spread reported — the shared host can
    swing 2-3x between days, so cross-round comparisons should use the TPU
    absolute time and treat vs_baseline as indicative.
    """
    import torch

    torch.set_num_threads(CPU_THREADS)

    coords = torch.tensor(
        np.asarray(mesh["cells", "coordinates"], dtype=np.float32)
    )  # (T, 3, 2)
    dofs_np = np.asarray(mesh["global", "ids"])[:, 0][
        np.asarray(mesh["cells", "vertices"])
    ]
    dofs = torch.tensor(dofs_np.astype(np.int64))  # (T, 3)
    markers = np.asarray(mesh["global", "markers"])[:, 0]
    n = markers.shape[0]
    inner = torch.tensor(np.nonzero(markers != 1)[0])
    det_scale = torch.tensor(
        np.asarray(mesh["fracture_map", "det"], dtype=np.float32)[
            np.asarray(mesh["cells", "fracture"])[:, 0]
        ].reshape(-1)
    )

    bar_grad = torch.tensor([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])

    def assemble():
        jac = coords.mT @ bar_grad  # (T, 2, 2)
        det = jac[:, 0, 0] * jac[:, 1, 1] - jac[:, 0, 1] * jac[:, 1, 0]
        inv = (
            torch.stack(
                [
                    torch.stack([jac[:, 1, 1], -jac[:, 0, 1]], dim=-1),
                    torch.stack([-jac[:, 1, 0], jac[:, 0, 0]], dim=-1),
                ],
                dim=-2,
            )
            / det[:, None, None]
        )
        grads = bar_grad @ inv  # (T, 3, 2)
        area = 0.5 * det * det_scale
        local = area[:, None, None] * (grads @ grads.mT)  # (T, 3, 3)
        b = torch.zeros(n)
        b.index_add_(
            0, dofs.reshape(-1), (area[:, None] / 3.0).expand(-1, 3).reshape(-1)
        )
        diag = torch.zeros(n)
        diag.index_add_(
            0, dofs.reshape(-1), torch.diagonal(local, dim1=-2, dim2=-1).reshape(-1)
        )
        return local, b, diag[inner]

    def pcg_tol(local, b, diag):
        b_red = b[inner]
        inv_diag = 1.0 / torch.where(diag != 0, diag, torch.ones_like(diag))
        flat_dofs = dofs.reshape(-1)
        b_norm = torch.sqrt(torch.dot(b_red, b_red))
        target = TOL * b_norm

        def matvec(xr):
            xf = torch.zeros(n)
            xf[inner] = xr
            y = torch.einsum("tij,tj->ti", local, xf[dofs])
            out = torch.zeros(n)
            out.index_add_(0, flat_dofs, y.reshape(-1))
            return out[inner]

        x = torch.zeros_like(b_red)
        r = b_red.clone()
        z = inv_diag * r
        p = z.clone()
        rz = torch.dot(r, z)
        iters = 0
        for _ in range(PCG_ITERS):
            ap = matvec(p)
            alpha = rz / torch.dot(p, ap)
            x += alpha * p
            r -= alpha * ap
            iters += 1
            if torch.sqrt(torch.dot(r, r)) <= target:
                break
            z = inv_diag * r
            rz_new = torch.dot(r, z)
            p = z + (rz_new / rz) * p
            rz = rz_new
        rel = torch.sqrt(torch.dot(r, r)) / b_norm
        return x, rel, iters

    # warmup
    local, b, diag = assemble()
    x, res, iters = pcg_tol(local, b, diag)
    log(f"cpu warmup: converged in {iters} iters, rel res {float(res):.3e}")

    # the shared host is noisy: median of CPU_REPEATS runs + spread
    times = []
    for _ in range(max(3, CPU_REPEATS)):
        t0 = time.perf_counter()
        local, b, diag = assemble()
        x, res, iters = pcg_tol(local, b, diag)
        times.append(time.perf_counter() - t0)
    cpu_time = float(np.median(times))
    spread = (float(np.min(times)), float(np.max(times)))
    log(f"cpu times: {['%.4f' % t for t in times]} -> median {cpu_time:.4f}s")

    x_full = np.zeros(n, dtype=np.float64)
    x_full[inner.numpy()] = x.numpy().astype(np.float64)
    return cpu_time, float(res), iters, x_full, spread


def main():
    if PROBE_S:
        rtt = probe_device(WD, PROBE_S)
        log(f"tunnel probe: first device op round-trip {rtt:.1f}s")
    mesh = build_mesh()
    n_dofs = mesh.n_global_dofs

    run = tpu_run_bsr if FORMAT == "bsr" else tpu_run
    tpu_time, tpu_res, tpu_iters, x_tpu, tpu_spread = run(mesh)
    if SKIP_CPU:
        # None -> JSON null: float('nan') would serialize as bare NaN,
        # which strict JSON consumers (jq, JSON.parse) reject
        cpu_time, cpu_res, cpu_iters, cpu_spread = None, None, -1, (0.0, 0.0)
        sol_diff = None
    else:
        cpu_time, cpu_res, cpu_iters, x_cpu, cpu_spread = cpu_baseline(mesh)
        denom = np.linalg.norm(x_cpu) or 1.0
        sol_diff = float(np.linalg.norm(x_tpu - x_cpu) / denom)
        log(f"solution parity: rel L2 diff tpu-vs-cpu = {sol_diff:.3e}")

    result = {
        "metric": "seven_fractures_dfn_assembly_pcg_wallclock",
        "value": tpu_time,
        "unit": "s",
        "vs_baseline": None if cpu_time is None else cpu_time / tpu_time,
        "detail": {
            "h": H,
            "tol": TOL,
            "n_dofs": n_dofs,
            "tpu_iters": tpu_iters,
            "cpu_iters": cpu_iters,
            "cpu_baseline_s": cpu_time,
            "tpu_residual": tpu_res,
            "cpu_residual": cpu_res,
            "solution_rel_diff": sol_diff,
            # absolute figures of merit: stable across rounds, unlike
            # vs_baseline whose shared-host denominator swings 2-3x
            "tpu_s_per_iteration": tpu_time / max(tpu_iters, 1),
            "tpu_dof_iters_per_s": n_dofs * tpu_iters / tpu_time,
            "tpu_time_spread_s": list(tpu_spread),
            "cpu_time_spread_s": list(cpu_spread),
            "cpu_threads": CPU_THREADS,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1" or not int(
        os.environ.get("BENCH_SUPERVISE", "1")
    ):
        main()
    else:
        # retry-with-backoff supervisor (VERDICT r04 item 1): transient
        # tunnel outages inside BENCH_RETRY_WINDOW_S no longer null the
        # round's headline number — each attempt runs this script as a
        # subprocess whose watchdog converts a hang into rc=3
        from pytorch_fem_solver_tpu.utils.watchdog import supervise

        sys.exit(supervise("seven_fractures_dfn_assembly_pcg_wallclock"))
