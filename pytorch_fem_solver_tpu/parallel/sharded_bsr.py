"""Fully row-sharded BSR assemble+solve: the multi-chip twin of
``ops.compiled.compiled_bsr_solver``.

The round-2 sharded BSR path kept the iterate replicated and built + applied
the whole two-level preconditioner redundantly on every device — O(n)
smoother setup/memory per chip, which is the wall the moment real multi-chip
exists. This module shards EVERYTHING whose size grows with n:

  matrix values      block-row slices (each device owns nb/n_shards rows,
                     tier-1 AND the hybrid tier-2 spill of its rows)
  assembly           halo-duplicated cell partition: each device integrates
                     the cells that touch its rows and scatters locally —
                     ZERO collectives in assembly (a boundary cell's local
                     matrix is recomputed on <= n_loc shards; flops are free
                     next to gathers/collectives on this hardware)
  vectors            x/r/z/p live row-sharded; the matvec all_gathers the
                     search direction once per iteration (ICI ring)
  smoother           per-shard (gs, gs) aggregate-block inverses built from
                     per-shard values only (aggregates never straddle a
                     shard: the padding makes shards whole aggregates)
  coarse level       Galerkin entries accumulate as per-shard partials
                     (one (nc, nc) psum per solve); the dense inverse is
                     computed redundantly (nc <= 4096) but APPLIED sharded:
                     each device owns nc/n_shards rows of A_c^{-1} and one
                     small all_gather of the restricted residual per apply

Collectives per PCG iteration: one tiled ``all_gather`` of the iterate
(n_pad floats), one tiled ``all_gather`` of the restricted residual (nc
floats), and three scalar ``psum`` dots — all riding the ICI ring.

NOTE (modeled, not measured): the collective-cost claims above are derived
from the scaling-book ring model (all_gather time ≈ bytes / ICI bandwidth,
latency-bound below ~1 MB per hop) and validated only for CORRECTNESS on a
virtual 8-device CPU mesh (tests/test_sharding.py, __graft_entry__.py).
No multi-chip ICI hardware is reachable from this host, so the constant
factors — and the claim that one iterate all_gather per iteration beats a
halo-exchange ppermute scheme at any given n/devices ratio — are unvalidated
on hardware.

No reference counterpart: the reference is strictly single-device
(SURVEY.md §2; no torch.distributed anywhere in /root/reference/torch_fem/).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.bsr import (
    bsr_expand,
    bsr_reduce,
    default_max_b,
    get_bsr_structure,
    inverse_inner_perm,
)
from ..ops.precondition import (
    _prolong,
    batched_small_inv,
    build_agg_block_table,
    default_aggregate_size,
    spd_inverse,
)
from ..ops.solvers import pcg
from .sharding import make_device_mesh, shard_map

__all__ = [
    "BSRShardPlan",
    "build_bsr_shard_plan",
    "get_bsr_shard_plan",
    "sharded_bsr_solver",
    "solve_pcg_sharded_bsr",
]


class BSRShardPlan(NamedTuple):
    """Host-built, value-independent tables for the row-sharded solve.

    All ``*_sh`` arrays are stacked per shard on the leading axis (already
    merged into it) and enter ``shard_map`` with that axis sharded; their
    per-device slices scale with n / n_shards (plus the cell halo), never
    with n.
    """

    st: object  # underlying BSRStructure (original padding)
    n_shards: int
    nb_pad: int  # block rows after shard/aggregate alignment padding
    rps: int  # block rows per shard
    g: int  # coarse aggregate size (fine DOFs)
    gs: int  # smoother block size (fine DOFs)
    nc: int
    nc_local: int
    ns_local: int  # smoother blocks per shard
    nh_max: int  # tier-2 rows per shard (padded max)
    T_max: int  # halo cells per shard (padded max)
    n_values_local: int
    cells_sh: np.ndarray  # (n_shards, T_max) global cell ids (pad: cell 0)
    slots_sh: jnp.ndarray  # (n_shards*T_max*n_loc^2,) local value slots
    bcols_sh: jnp.ndarray  # (nb_pad, B) global block columns (pad rows: 0)
    bcols2_sh: jnp.ndarray  # (n_shards*nh_max, B2)
    hrows_sh: jnp.ndarray  # (n_shards*nh_max,) local block-row; pad: rps
    agg_sh: jnp.ndarray  # (n_shards*ns_local, bpa, bpa) local block ids
    vec_slots_sh: jnp.ndarray = None  # (n_shards*T_max*n_loc,) local reduced
    #   row per (halo cell, i_loc) entry; foreign/Dirichlet/pad -> rps*k
    #   (out of range, dropped) — the per-shard residual-vector scatter
    owned_cells_sh: jnp.ndarray = None  # (n_shards*T_max,) bool: disjoint
    #   exactly-once cell ownership (shard of the cell's first inner row;
    #   always inside that shard's halo) — per-cell quantities (mixed B
    #   blocks, functionals) sum exactly once across shards


def _local_block_ids(plan_args, blk):
    """Vectorized global flat block id -> (owner shard, local block id).

    Tier-1 block ``blk < nb*B`` lives at row ``blk // B``; a tier-2 block
    belongs to ``heavy[(blk - nb*B) // B2]``. Local layout per shard:
    ``[tier1 rows*B | tier2 h_local*B2]``.
    """
    nb, B, B2, heavy, h_local, rps = plan_args
    t1 = blk < nb * B
    row1 = np.minimum(blk // B, nb - 1)
    idx2 = np.maximum(blk - nb * B, 0)
    if heavy.size:
        h = np.minimum(idx2 // max(B2, 1), heavy.size - 1)
        row2 = heavy[h]
        l2 = rps * B + h_local[h] * B2 + idx2 % max(B2, 1)
    else:
        row2 = np.zeros_like(blk)
        l2 = np.zeros_like(blk)
    row = np.where(t1, row1, row2)
    owner = row // rps
    lblk = np.where(t1, (row1 - owner * rps) * B + blk % B, l2)
    return owner, lblk


def build_bsr_shard_plan(
    basis,
    n_shards: int,
    max_b: Optional[int] = None,
    g: Optional[int] = None,
    gs: Optional[int] = None,
) -> BSRShardPlan:
    """Host-side construction of all per-shard tables (value-independent;
    cache through :func:`get_bsr_shard_plan`)."""
    if max_b is None:
        max_b = default_max_b(basis)
    st = get_bsr_structure(basis, max_b=max_b, want_entry_slot=True)
    k, nb = st.block, st.nb
    B = st.bcols.shape[1]
    nh, B2 = st.bcols2.shape
    heavy = np.asarray(st.heavy_rows)
    kk = k * k

    if g is None:
        g = default_aggregate_size(st)
    if gs is None:
        gs = 128 if (g % 128 == 0 and g > 128) else min(g, 128)
        if g % gs:
            gs = g  # non-power-of-two aggregate: keep smoother == aggregate
    if g % k or gs % k:
        raise ValueError(f"g={g} and gs={gs} must be multiples of block {k}")

    # pad block rows so every shard is a whole number of coarse aggregates
    # AND smoother blocks
    unit = n_shards * int(np.lcm(g, gs)) // k
    nb_pad = -(-nb // unit) * unit
    rps = nb_pad // n_shards
    n_pad = nb_pad * k
    nc = n_pad // g
    nc_local = nc // n_shards
    ns_local = (n_pad // gs) // n_shards
    bpa = gs // k

    # ---- tier-2 per-shard partition (heavy rows are sorted ascending) ----
    if nh:
        owner_h = heavy // rps
        counts_h = np.bincount(owner_h, minlength=n_shards)
        nh_max = int(counts_h.max())
        starts_h = np.concatenate([[0], np.cumsum(counts_h)])
        h_local = np.arange(nh) - starts_h[owner_h]
        hrows_sh = np.full((n_shards, nh_max), rps, dtype=np.int64)
        hrows_sh[owner_h, h_local] = heavy - owner_h * rps
        bcols2_sh = np.zeros((n_shards, nh_max, B2), dtype=np.int64)
        bcols2_sh[owner_h, h_local] = np.asarray(st.bcols2)
    else:
        nh_max = 0
        h_local = np.zeros(0, dtype=np.int64)
        hrows_sh = np.zeros((n_shards, 0), dtype=np.int64)
        bcols2_sh = np.zeros((n_shards, 0, B2), dtype=np.int64)

    n_blocks_local = rps * B + nh_max * B2
    n_values_local = n_blocks_local * kk
    plan_args = (nb, B, B2, heavy, h_local, rps)

    # ---- per-entry ownership and local slots ------------------------------
    es = np.asarray(st.entry_slot)
    dofs = np.asarray(basis._global_dofs4elements)
    n_loc = dofs.shape[-1]
    T = dofs.reshape(-1, n_loc).shape[0]
    n_loc2 = n_loc * n_loc
    assert es.size == T * n_loc2, "entry_slot/cell table mismatch"
    valid = es < st.n_values
    blk = np.where(valid, es // kk, 0)
    inb = es % kk
    owner, lblk = _local_block_ids(plan_args, blk)
    owner = np.where(valid, owner, -1)
    lslot = lblk * kk + inb

    # ---- halo cell partition ----------------------------------------------
    flat_idx = np.arange(T * n_loc2)
    sel = owner >= 0
    cellidx = flat_idx // n_loc2
    keys = owner[sel] * T + cellidx[sel]
    keys_pairs = np.unique(keys)
    pair_owner = keys_pairs // T
    pair_cell = keys_pairs % T
    counts_c = np.bincount(pair_owner, minlength=n_shards)
    T_max = max(int(counts_c.max(initial=0)), 1)
    starts_c = np.concatenate([[0], np.cumsum(counts_c)])
    pos_in_shard = np.arange(keys_pairs.size) - starts_c[pair_owner]
    cells_sh = np.zeros((n_shards, T_max), dtype=np.int64)
    cells_sh[pair_owner, pos_in_shard] = pair_cell
    pair_rank = np.searchsorted(keys_pairs, keys)
    pos = pos_in_shard[pair_rank]
    slots_sh = np.full((n_shards, T_max * n_loc2), n_values_local, np.int64)
    slots_sh[owner[sel], pos * n_loc2 + flat_idx[sel] % n_loc2] = lslot[sel]

    # ---- per-shard residual-vector scatter ---------------------------------
    # (halo cell, i_loc) -> local reduced row when this shard owns the row.
    # Every real (cell, i) entry has exactly ONE owning shard, and that
    # shard's halo contains the cell (the (i, i) matrix entry put it there),
    # so scatter-adding per shard assembles the reduced residual exactly
    # once with zero collectives.
    lrows = rps * k
    inv_pos = inverse_inner_perm(st, int(basis.n_dofs), sentinel=lrows * n_shards)
    d_sh = dofs.reshape(-1, n_loc)[cells_sh]  # (n_shards, T_max, n_loc)
    pos_v = inv_pos[d_sh]
    shard_col = np.arange(n_shards)[:, None, None]
    own_v = pos_v // lrows == shard_col
    real_cell = (np.arange(T_max)[None, :] < counts_c[:, None])[..., None]
    vec_slots = np.where(own_v & real_cell, pos_v - shard_col * lrows, lrows)

    # ---- exactly-once cell ownership ---------------------------------------
    # owner(cell) = shard of the cell's first inner row — that shard's halo
    # contains the cell (its diagonal entry put it there), so per-cell sums
    # masked by this flag cover every real cell exactly once. Cells with no
    # inner DOF contribute nothing to reduced quantities and get no owner.
    pos_all = inv_pos[dofs.reshape(-1, n_loc)]  # (T, n_loc)
    first = pos_all.min(axis=1)
    cell_owner = np.where(first < lrows * n_shards, first // lrows, n_shards)
    owned_cells = (
        cell_owner[cells_sh] == np.arange(n_shards)[:, None]
    ) & real_cell[..., 0]

    # ---- per-shard aggregate-block smoother tables -------------------------
    table_g = build_agg_block_table(st._replace(n_pad=n_pad, nb=nb_pad), gs)
    sentinel_g = nb * B + nh * B2
    tg = table_g.reshape(n_shards, ns_local, bpa, bpa)
    tvalid = tg < sentinel_g
    towner, tlocal = _local_block_ids(plan_args, np.where(tvalid, tg, 0))
    shard_ix = np.arange(n_shards)[:, None, None, None]
    assert bool(
        np.all((towner == shard_ix) | ~tvalid)
    ), "in-aggregate block owned by a foreign shard (padding misaligned)"
    agg_sh = np.where(tvalid, tlocal, n_blocks_local)

    i_t = np.int32 if n_values_local < 2**31 else np.int64
    return BSRShardPlan(
        st=st,
        n_shards=n_shards,
        nb_pad=nb_pad,
        rps=rps,
        g=g,
        gs=gs,
        nc=nc,
        nc_local=nc_local,
        ns_local=ns_local,
        nh_max=nh_max,
        T_max=T_max,
        n_values_local=n_values_local,
        cells_sh=cells_sh,
        slots_sh=jnp.asarray(slots_sh.reshape(-1), dtype=i_t),
        bcols_sh=jnp.asarray(
            np.concatenate(
                [np.asarray(st.bcols),
                 np.zeros((nb_pad - nb, B), dtype=np.int64)]
            ),
            dtype=np.int32,
        ),
        bcols2_sh=jnp.asarray(
            bcols2_sh.reshape(n_shards * nh_max, B2), dtype=np.int32
        ),
        hrows_sh=jnp.asarray(hrows_sh.reshape(-1), dtype=np.int32),
        agg_sh=jnp.asarray(
            agg_sh.reshape(n_shards * ns_local, bpa, bpa), dtype=i_t
        ),
        vec_slots_sh=jnp.asarray(vec_slots.reshape(-1), dtype=np.int32),
        owned_cells_sh=jnp.asarray(owned_cells.reshape(-1)),
    )


def get_bsr_shard_plan(basis, n_shards: int, **kwargs) -> BSRShardPlan:
    """Cached-per-basis shard plan, keyed by (n_shards, kwargs)."""
    cache = getattr(basis, "_bsr_shard_plans", None)
    if cache is None:
        cache = {}
        basis._bsr_shard_plans = cache
    key = (n_shards, tuple(sorted(kwargs.items())))
    plan = cache.get(key)
    if plan is None:
        plan = build_bsr_shard_plan(basis, n_shards, **kwargs)
        cache[key] = plan
    return plan


def _scatter_local_values(plan, local_s, slots_s):
    """Per-shard value scatter (no collectives): halo-cell element matrices
    (T_max, n_loc, n_loc) -> (tier-1 (rps, B, k, k), tier-2
    (nh_max, B2, k, k), local point diagonal)."""
    st = plan.st
    k, kk = st.block, st.block * st.block
    B, B2 = st.bcols.shape[1], st.bcols2.shape[1]
    vals = (
        jnp.zeros((plan.n_values_local,), dtype=local_s.dtype)
        .at[slots_s]
        .add(local_s.reshape(-1), mode="drop")
    )
    v1 = vals[: plan.rps * B * kk].reshape(plan.rps, B, k, k)
    v2 = vals[plan.rps * B * kk :].reshape(plan.nh_max, B2, k, k)
    diag_local = jnp.diagonal(v1[:, 0], axis1=-2, axis2=-1).reshape(-1)
    return v1, v2, diag_local


def _shard_matvec(plan, axis, v1, v2, bcols_s, bcols2_s, hrows_s):
    """Row-sharded SpMV closure: one tiled all_gather of the iterate per
    application, tier-1 + hybrid tier-2 local block contractions."""
    st = plan.st
    k = st.block
    B, B2 = st.bcols.shape[1], st.bcols2.shape[1]
    rps, nh_max, nb_pad = plan.rps, plan.nh_max, plan.nb_pad

    def matvec(x_local):
        x_full = jax.lax.all_gather(x_local, axis, tiled=True)
        x2 = x_full.reshape(nb_pad, k)
        xo = x_local.reshape(rps, k)
        y = jnp.einsum(
            "rij,rj->ri", v1[:, 0], xo,
            preferred_element_type=x_local.dtype,
        )
        if B > 1:
            y = y + jnp.einsum(
                "rbij,rbj->ri", v1[:, 1:], x2[bcols_s[:, 1:]],
                preferred_element_type=x_local.dtype,
            )
        if nh_max:
            y2 = jnp.einsum(
                "rbij,rbj->ri", v2, x2[bcols2_s],
                preferred_element_type=x_local.dtype,
            )
            y = y.at[hrows_s].add(
                y2, mode="drop", indices_are_sorted=True,
                unique_indices=True,
            )
        return y.reshape(-1)

    return matvec


def _shard_two_level_precond(
    plan, axis, v1, v2, agg_s, bcols_s, bcols2_s, hrows_s
):
    """Per-shard two-level (aggregate-block smoother + sharded-apply dense
    coarse) preconditioner closure, built from local values only (one
    (nc, nc) psum for the Galerkin coarse matrix)."""
    st = plan.st
    k, kk = st.block, st.block * st.block
    B2 = st.bcols2.shape[1]
    rps, nh_max = plan.rps, plan.nh_max
    g, gs, nc, nc_local = plan.g, plan.gs, plan.nc, plan.nc_local
    bpg, bpa = g // k, gs // k

    # per-shard smoother: (gs, gs) aggregate diagonal blocks from LOCAL
    # values only (aggregates never straddle shards)
    flat = jnp.concatenate(
        [
            v1.reshape(-1, kk),
            v2.reshape(-1, kk),
            jnp.zeros((1, kk), dtype=v1.dtype),
        ]
    )
    rows = flat[agg_s]  # (ns_local, bpa, bpa, kk)
    D = rows.reshape(-1, bpa, bpa, k, k).transpose(
        0, 1, 3, 2, 4
    ).reshape(-1, gs, gs)
    zero_d = jnp.diagonal(D, axis1=-2, axis2=-1) == 0
    D = D + jnp.eye(gs, dtype=D.dtype) * zero_d[:, None, :]
    inv_agg = batched_small_inv(D)

    # coarse Galerkin: per-shard partials + one (nc, nc) psum per solve;
    # the dense inverse is redundant compute (nc <= 4096) but its
    # per-iteration APPLY is row-sharded
    my = jax.lax.axis_index(axis)
    rows_c = (my * rps + jnp.arange(rps, dtype=jnp.int32)) // bpg
    bins1 = (rows_c[:, None] * nc + bcols_s // bpg).reshape(-1)
    part = jax.ops.segment_sum(
        v1.sum(axis=(-1, -2)).reshape(-1), bins1,
        num_segments=nc * nc,
    )
    if nh_max:
        # sentinel rows (hrows == rps) land in a foreign bin with zero
        # values — harmless
        hg = (my * rps + hrows_s) // bpg
        bins2 = (hg[:, None] * nc + bcols2_s // bpg).reshape(-1)
        part = part + jax.ops.segment_sum(
            v2.sum(axis=(-1, -2)).reshape(-1), bins2,
            num_segments=nc * nc,
        )
    coarse = jax.lax.psum(part, axis).reshape(nc, nc)
    coarse = 0.5 * (coarse + coarse.T)
    shift = jnp.maximum(jnp.trace(coarse) / nc, 1.0)
    coarse_inv = spd_inverse(
        coarse + 1e-7 * shift * jnp.eye(nc, dtype=coarse.dtype)
    )
    start = (my * nc_local).astype(jnp.int32)
    coarse_rows = jax.lax.dynamic_slice(
        coarse_inv, (start, jnp.zeros((), jnp.int32)),
        (nc_local, nc),
    )

    def precond(r_local):
        fine = jnp.einsum(
            "rij,rj->ri", inv_agg, r_local.reshape(-1, gs),
            preferred_element_type=r_local.dtype,
        ).reshape(-1)
        rc_l = r_local.reshape(-1, g).sum(-1)
        rc = jax.lax.all_gather(rc_l, axis, tiled=True)
        zc_l = coarse_rows @ rc
        return fine + _prolong(zc_l, g, rps * k)

    return precond


def _shard_jacobi_precond(diag_local):
    safe = jnp.where(diag_local != 0, diag_local, 1.0)
    inv_d = 1.0 / safe
    return lambda r: inv_d * r


def _make_sharded_run(plan, device_mesh, precondition, tol, maxiter):
    """shard_map'ed program: per-shard local element matrices -> values ->
    preconditioner slices -> row-sharded PCG. Returns
    ``run(local_sh, b_pad) -> (x_full, iters, res, conv)`` where
    ``local_sh`` is (n_shards*T_max, n_loc, n_loc) (sharded) and ``b_pad``
    the permuted padded rhs (n_pad,) (sharded by rows)."""
    axis = device_mesh.axis_names[0]
    if maxiter is None:
        maxiter = max(10 * plan.nb_pad * plan.st.block, 100)
    if precondition not in ("auto", "two_level", "jacobi"):
        raise ValueError(f"unknown precondition: {precondition!r}")

    # jit on top of shard_map is essential: an eager shard_map call
    # dispatches per-op across the mesh (measured 47 s for a 289-DOF solve
    # on the 8-virtual-device CPU mesh vs 4.4 s traced+compiled+run, and
    # it re-executes at full cost every call)
    @jax.jit
    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis)),
        out_specs=(P(), P(), P(), P()),
        # the gathered iterate is mathematically replicated but the
        # varying-axis tracker cannot prove it
        check_vma=False,
    )
    def run(local_s, slots_s, bcols2_s, hrows_s, agg_s, b_local, bcols_s):
        v1, v2, diag_local = _scatter_local_values(plan, local_s, slots_s)
        matvec = _shard_matvec(plan, axis, v1, v2, bcols_s, bcols2_s, hrows_s)
        pdot = lambda u, v: jax.lax.psum(jnp.sum(u * v), axis)

        if precondition in ("auto", "two_level"):
            precond = _shard_two_level_precond(
                plan, axis, v1, v2, agg_s, bcols_s, bcols2_s, hrows_s
            )
        else:  # jacobi
            precond = _shard_jacobi_precond(diag_local)

        x, info = pcg(
            matvec, b_local, precond=precond, tol=tol,
            maxiter=maxiter, dot=pdot,
        )
        x_full = jax.lax.all_gather(x, axis, tiled=True)
        return x_full, info.iterations, info.residual_norm, info.converged

    def run_with_tables(local_sh, b_pad):
        return run(
            local_sh,
            plan.slots_sh,
            plan.bcols2_sh,
            plan.hrows_sh,
            plan.agg_sh,
            b_pad,
            plan.bcols_sh,
        )

    return run_with_tables


def _get_sharded_run(
    basis, plan, device_mesh, precondition, tol, maxiter, max_b
):
    """Per-basis cache of the jitted sharded-run program: repeat solves on
    the same basis/mesh/settings hit the jit cache instead of re-tracing
    (the shard_map closure identity must be stable for that)."""
    cache = getattr(basis, "_bsr_sharded_runs", None)
    if cache is None:
        cache = {}
        basis._bsr_sharded_runs = cache
    mesh_key = (
        tuple(device_mesh.axis_names),
        tuple(d.id for d in device_mesh.devices.flat),
    )
    key = (mesh_key, precondition, float(tol), maxiter, max_b)
    run = cache.get(key)
    if run is None:
        run = _make_sharded_run(plan, device_mesh, precondition, tol, maxiter)
        cache[key] = run
    return run


def sharded_bsr_solver(
    basis,
    bilinear_form: Callable,
    linear_form: Optional[Callable] = None,
    device_mesh=None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    precondition: str = "auto",
    max_b: Optional[int] = None,
):
    """One-jit assemble+solve with cells AND block rows sharded: the
    multi-chip twin of :func:`ops.compiled.compiled_bsr_solver`.

    Each device integrates the (halo-duplicated) cells touching its block
    rows, scatters into its local value slice, builds its slices of the
    aggregate-block smoother and coarse rows, and runs row-sharded PCG —
    see the module docstring for the collective budget. The right-hand
    side assembles once at construction (it is O(n), not O(nnz)); the
    returned ``solve(b=None) -> (u, (iters, res, converged))`` takes an
    optional replacement rhs as a jit argument, so re-solves with new data
    reuse the compiled program.
    """
    if device_mesh is None:
        device_mesh = make_device_mesh()
    n_shards = int(device_mesh.devices.size)
    plan = get_bsr_shard_plan(basis, n_shards, max_b=max_b)
    st = plan.st
    k = st.block
    n_pad = plan.nb_pad * k

    # per-shard halo cell data: host-gathered once (the basis arrays are
    # host-committed NumPy at construction) — per-device memory is
    # T_max ~ T/n_shards + halo, not T
    cells = plan.cells_sh.reshape(-1)
    vgrad_sh = jnp.asarray(np.asarray(basis.v_grad)[cells])
    dx_sh = jnp.asarray(np.asarray(basis._dx)[cells])
    pts_sh = jnp.asarray(np.asarray(basis.integration_points)[cells])

    if linear_form is not None:
        b0 = basis.integrate_linear_form(linear_form)
    else:
        b0 = jnp.zeros(
            (basis.n_dofs, 1), dtype=basis._coords4global_dofs.dtype
        )

    run = _make_sharded_run(plan, device_mesh, precondition, tol, maxiter)

    from ..ops.compiled import _CellChunkView

    element = basis._element
    v_all = basis.v
    evaluate = basis._evaluate_form
    n_dofs = basis.n_dofs
    solution0 = basis.solution_tensor()

    @jax.jit
    def _solve(vg, dx, pts, b):
        view = _CellChunkView(v_all, vg, pts, dx, element)
        local_sh = (evaluate(bilinear_form, view) * dx).sum(-3)
        b_pad = jnp.pad(bsr_reduce(st, b), (0, n_pad - st.n_pad))
        x_full, it, res, conv = run(local_sh, b_pad)
        u = solution0 + bsr_expand(st, x_full[: st.n_pad], n_dofs)
        return u, (it, res, conv)

    def solve(b=None):
        return _solve(vgrad_sh, dx_sh, pts_sh, b0 if b is None else b)

    return solve


def solve_pcg_sharded_bsr(
    basis,
    local_matrices,
    vector,
    device_mesh=None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    precondition: str = "two_level",
    return_info: bool = False,
    max_b: Optional[int] = None,
):
    """PCG on precomputed element matrices with block rows sharded.

    Same contract as the round-2 version (``parallel.sharding``), now on
    the fully sharded core: the iterate/residual/search vectors, the hybrid
    tier-1/tier-2 values, the (gs, gs) aggregate-block smoother and the
    coarse-inverse rows all live row-sharded (per-device memory for every
    O(n) table is n/n_shards); only the (nc, nc) dense coarse factorization
    is computed redundantly. ``precondition='two_level'`` matches the
    single-chip aggblock policy (iteration parity asserted in tests and the
    driver dryrun); ``'jacobi'`` uses the sharded point diagonal.
    """
    if device_mesh is None:
        device_mesh = make_device_mesh()
    n_shards = int(device_mesh.devices.size)
    plan = get_bsr_shard_plan(basis, n_shards, max_b=max_b)
    st = plan.st
    k = st.block
    n_pad = plan.nb_pad * k

    n_loc = int(basis._global_dofs4elements.shape[-1])
    local = jnp.asarray(local_matrices).reshape(-1, n_loc, n_loc)
    local_sh = local[jnp.asarray(plan.cells_sh.reshape(-1))]

    run = _get_sharded_run(
        basis, plan, device_mesh, precondition, tol, maxiter, max_b
    )
    b_pad = jnp.pad(bsr_reduce(st, vector), (0, n_pad - st.n_pad))
    x_full, it, res, conv = run(local_sh, b_pad)
    u = basis.solution_tensor() + bsr_expand(
        st, x_full[: st.n_pad], basis.n_dofs
    )
    if return_info:
        from ..ops.solvers import PCGInfo

        return u, PCGInfo(it, res, conv)
    return u
