"""Block-sparse (BSR) operators: row-gather SpMV for the PCG hot loop.

Measured on the target TPU, gathers cost ~7.6 ns per *scalar* index but only
~3.5 ns per *row-of-8* index (~0.45 ns/float) — the hardware charges per
gather descriptor, not per float. The ELL SpMV in ``ops.sparse`` issues one
scalar index per stored entry (~8n indices); this module reformulates the
reduced operator as 8x8 block-sparse with the unknowns laid out as
``(n/8, 8)`` so the SpMV gathers whole x-blocks:

    y_block[r] = sum_b  A[r, b] (8x8)  @  x2[bcols[r, b]] (8,)

which is ``nb * B`` row gathers (~n * B/8 indices, B ~ 6-10 distinct
neighbor blocks per block-row) plus a batched 8x8 matvec that XLA maps onto
the VPU. At bench scale this is a ~6x faster SpMV than ELL.

Block locality comes from a spatial reordering of the interior DOFs
(``spatial_order``: coordinate bisection with group-aligned splits):
neighbors of the 8 rows in a block then fall into a handful of shared
blocks. The same ordering makes *contiguous, fixed-size*
aggregates spatially coherent, so the companion two-level preconditioner
(``ops.precondition.block_two_level_from_values``) restricts/prolongs with
pure reshapes — zero gathers.

Fills the performance role of the reference's dense assembly + LU
(``/root/reference/torch_fem/basis/abstract_basis.py:74-195``) for large
systems; host-side structure build mirrors the split used everywhere else in
this package (value-independent tables on host once, value-dependent
assembly as one jitted gather + sorted scatter).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import config


class BSRStructure(NamedTuple):
    """Static (host-built) block-sparse layout for a reduced FEM operator.

    The reduced system is permuted by ``perm`` (spatial ordering) and padded
    to ``n_pad`` (identity rows); all device tables index the permuted,
    padded numbering.

    Optionally *hybrid*: with ``max_b`` set, block-rows touching more than
    ``max_b`` neighbor blocks (fracture-trace rows — mean block degree ~7.6
    vs max ~24 on the DFN benchmark) spill their excess blocks into a small
    second tier (``bcols2``/``heavy_rows``), trimming the padded tier-1
    storage the SpMV streams every iteration.
    """

    bcols: jnp.ndarray  # (nb, B) block-column ids; own block at b=0; pad -> 0
    entry_slot: jnp.ndarray  # (T*n_loc^2,) value slot per flat element entry;
    #   entries touching Dirichlet DOFs point at n_values (dropped)
    perm: np.ndarray  # (n_inner,) permuted position -> original reduced id
    inner_perm: np.ndarray  # (n_inner,) global DOF id at each permuted slot
    n_inner: int
    n_pad: int
    nb: int
    block: int
    n_values: int  # total value slots: (nb * B + nh * B2) * block^2
    bcols2: jnp.ndarray  # (nh, B2) spilled block-column ids (nh = 0: no tier)
    heavy_rows: jnp.ndarray  # (nh,) block-rows owning the spilled blocks
    entry_slot_sym: jnp.ndarray = None  # (T*n_loc*(n_loc+1)/2,) canonical-
    #   pair slots for symmetric assembly (drop slot on Dirichlet entries)
    tpartner: jnp.ndarray = None  # (S_blocks,) mirror block id per block
    ubr_host: np.ndarray = None  # (n_blocks,) host block-row of stored blocks
    ubc_host: np.ndarray = None  # (n_blocks,) host block-col of stored blocks
    blk_id_host: np.ndarray = None  # (n_blocks,) host flat value-block id


def spatial_order(coords: np.ndarray, group: int = 32) -> np.ndarray:
    """Coordinate-bisection ordering with group-aligned splits.

    Returns a permutation such that every consecutive ``group``-sized range
    of the new order is a spatially compact cluster (split points are
    multiples of ``group``, so clusters never straddle a range boundary —
    unlike sorting ``precondition.spatial_aggregates`` ids, whose variable
    cluster sizes would desynchronize from fixed-size aggregates).
    """
    coords = np.asarray(coords)
    n = coords.shape[0]
    perm = np.empty(n, dtype=np.int64)
    out = [0]

    stack = [np.arange(n)]
    while stack:
        idx = stack.pop()
        if idx.size <= group:
            perm[out[0] : out[0] + idx.size] = idx
            out[0] += idx.size
            continue
        spans = coords[idx].max(0) - coords[idx].min(0)
        ax = int(np.argmax(spans))
        order = idx[np.argsort(coords[idx, ax], kind="stable")]
        # split at a group multiple nearest the median so every completed
        # left part is whole groups
        half = max(group, ((idx.size // 2) // group) * group)
        # LIFO stack: push right first so the left half is emitted first
        stack.append(order[half:])
        stack.append(order[:half])
    return perm


def build_bsr_structure(
    dofs,
    n_dofs: int,
    inner,
    coords,
    block: int = 8,
    pad_to: int = 32,
    leaf: int = 32,
    max_b: int | None = None,
    want_entry_slot: bool = True,
) -> BSRStructure:
    """Host-side construction of the permuted block-sparse layout.

    Args:
      dofs: (T, n_loc) global DOF ids per cell.
      n_dofs: total global DOF count.
      inner: (n_inner,) interior DOF ids (Dirichlet eliminated).
      coords: (n_inner, d) coordinates of the interior DOFs, used for the
        spatial reordering that gives block locality.
      block: block edge (8 = VPU-lane friendly row-gather width).
      pad_to: pad the permuted system to a multiple of this (32 keeps the
        two-level aggregates an integer number of blocks).
      leaf: spatial-bisection cluster size for the ordering.
      max_b: cap on neighbor blocks per block-row in tier 1; rows over the
        cap spill the excess blocks to the second tier. None = no cap.
      want_entry_slot: build the full per-entry scatter table used by the
        NON-symmetric assembly (``bsr_values_from_local``). Symmetric-only
        callers skip it: at 1.57M tets it is ~9 s of host build plus the
        single largest device table (T*n_loc^2 int32) shipped for nothing.
    """
    import os
    import time

    profile = bool(os.environ.get("BSR_BUILD_PROFILE"))
    marks = [("start", time.perf_counter())]

    def mark(name):
        if profile:
            marks.append((name, time.perf_counter()))

    dofs = np.asarray(dofs).reshape(-1, np.asarray(dofs).shape[-1])
    inner = np.asarray(inner)
    coords = np.asarray(coords)
    n_loc = dofs.shape[1]
    n_inner = int(inner.size)

    # spatial ordering: bisection with group-aligned split points, so every
    # consecutive ``leaf``-sized index range is one spatial cluster — the
    # two-level aggregates then coincide with the clusters while remaining
    # pure reshapes
    perm = spatial_order(coords, group=leaf)
    inner_perm = inner[perm]
    mark("spatial_order")

    pad_to = int(np.lcm(np.lcm(block, pad_to), leaf))
    # round n_pad up so every power-of-two aggregate multiple divides it:
    # ``default_aggregate_size`` scales g = 32 * mult to keep the dense
    # coarse level <= 4096, and its divisibility search degenerates when
    # n_pad/32 has no small factors (observed: n_pad = 32 * 7489, 7489
    # prime -> g = n_pad, a one-unknown coarse level that silently turned
    # the two-level into plain Jacobi at 245k DOFs)
    n0 = -(-max(n_inner, 1) // pad_to) * pad_to
    mult = -(-n0 // (4096 * 4 * block))  # 4*block = the base aggregate
    # two extra doublings beyond the constants-space need: the affine
    # coarse space uses 4 vectors on 4x-larger aggregates (same dense
    # coarse size), so its aggregate must divide n_pad too
    pad_to *= 1 << max(int(mult - 1).bit_length() + 2, 2)
    n_pad = -(-max(n_inner, 1) // pad_to) * pad_to
    nb = n_pad // block

    new_id = np.full(n_dofs, -1, dtype=np.int64)
    new_id[inner_perm] = np.arange(n_inner)

    # per ORIGINAL flat entry: ascending-unique-block rank (-1 = dropped)
    # and in-block position. The native kernel fuses the expansion, the
    # KV radix dedup and the rank scatter into three streaming passes
    # (native/src/fem_native.cpp:fem_bsr_pair_ranks); the NumPy fallback
    # produces byte-identical arrays.
    from ..native import bsr_pair_ranks as native_bsr_pair_ranks

    native_pr = native_bsr_pair_ranks(dofs, new_id, block, nb)
    if native_pr is not None:
        rank_all, in_block_all, bkeys, rank_sym_n, in_block_sym_n = native_pr
    else:
        rank_sym_n = in_block_sym_n = None
        rows = new_id[np.repeat(dofs, n_loc, axis=1).reshape(-1)]
        cols = new_id[np.tile(dofs, (1, n_loc)).reshape(-1)]
        valid = (rows >= 0) & (cols >= 0)
        in_block_all = np.where(
            valid, (rows % block) * block + (cols % block), 0
        )
        kept = np.nonzero(valid)[0]
        bkeys, inv = np.unique(
            (rows[kept] // block) * nb + cols[kept] // block,
            return_inverse=True,
        )
        rank_all = np.full(rows.size, -1, dtype=np.int64)
        rank_all[kept] = inv.reshape(-1)
    mark("pair_dedup")
    ubr = bkeys // nb
    ubc = bkeys % nb
    counts = np.bincount(ubr, minlength=nb)
    B_full = max(1, int(counts.max(initial=0)))
    if max_b is not None and int(max_b) < 1:
        raise ValueError(f"max_b must be >= 1, got {max_b}")
    B = B_full if max_b is None else min(B_full, int(max_b))

    starts = np.concatenate([[0], np.cumsum(counts)])
    b_of = np.arange(bkeys.size) - starts[ubr]
    # swap each row's diagonal block into position 0 so the Jacobi diagonal
    # and the padded identity rows always live at b=0
    diag = ubr == ubc
    diag_pos = np.zeros(nb, dtype=np.int64)
    diag_pos[ubr[diag]] = b_of[diag]
    b_of = np.where(diag, 0, np.where(b_of == 0, diag_pos[ubr], b_of))

    bcols = np.zeros((nb, B), dtype=np.int64)
    bcols[:, 0] = np.arange(nb)  # empty block-rows keep a harmless self ref
    tier1 = b_of < B
    bcols[ubr[tier1], b_of[tier1]] = ubc[tier1]

    # second tier: the spilled blocks of heavy rows, compacted to (nh, B2)
    heavy_rows = np.unique(ubr[~tier1])
    nh = heavy_rows.size
    B2 = max(int(counts.max(initial=0)) - B, 0) if nh else 0
    heavy_rank = np.zeros(nb, dtype=np.int64)
    heavy_rank[heavy_rows] = np.arange(nh)
    bcols2 = np.zeros((nh, B2), dtype=np.int64)
    bcols2[heavy_rank[ubr[~tier1]], b_of[~tier1] - B] = ubc[~tier1]

    # flat block id per unique pair: tier-1 ids first, tier-2 past them
    n_values1 = nb * B * block * block
    blk_id = np.where(
        b_of < B,
        ubr * B + b_of,
        nb * B + heavy_rank[ubr] * B2 + (b_of - B),
    )
    # all-Dirichlet meshes have zero stored blocks; keep the gathers below
    # legal (every rank is -1, so the padded id is masked to n_values)
    blk_id_safe = blk_id if blk_id.size else np.zeros(1, dtype=np.int64)

    n_values = int(n_values1 + nh * B2 * block * block)
    if want_entry_slot:
        # slot of every element entry in ORIGINAL order: block pair ->
        # tier + b index, then the in-block position; boundary-touching
        # entries point one past the end and are dropped by the scatter's
        # OOB mode — this avoids both a pre-sort gather on device and the
        # host sort (measured: unsorted scatter 20 ms vs gather+sorted 30)
        entry_slot = np.where(
            rank_all >= 0,
            blk_id_safe[np.maximum(rank_all, 0)] * (block * block)
            + in_block_all,
            n_values,
        )
    else:
        entry_slot = np.zeros((0,), dtype=np.int64)
    mark("entry_slots")

    # --- symmetric-assembly tables ------------------------------------
    # For symmetric local matrices only the n_loc*(n_loc+1)/2 unordered DOF
    # pairs need scattering (scatters are charged per element: 9 -> 6
    # entries per P1 triangle is a 1/3 cut of the dominant assembly cost);
    # the mirror blocks are completed on device by one block-row gather +
    # in-block transpose (``bsr_values_from_local_symmetric``).
    # The canonical (row <= col) representative of each unordered pair is
    # itself one of the n_loc^2 original entries, so its block rank is a
    # direct rank_all lookup — no searchsorted pass over the pair keys.
    # The native kernel already emitted the per-pair rank/in-block tables;
    # the fallback derives them with gathers.
    if rank_sym_n is not None:
        rank_s, in_block_s = rank_sym_n, in_block_sym_n
    else:
        iu, ju = np.triu_indices(n_loc)
        g_i = new_id[dofs[:, iu]]  # (T, P)
        g_j = new_id[dofs[:, ju]]
        sel = np.where(g_i <= g_j, iu * n_loc + ju, ju * n_loc + iu)
        flat = np.arange(dofs.shape[0])[:, None] * (n_loc * n_loc) + sel
        rank_s = rank_all[flat].reshape(-1)
        in_block_s = (
            (np.minimum(g_i, g_j) % block) * block
            + (np.maximum(g_i, g_j) % block)
        ).reshape(-1)
        rank_s = np.where(((g_i >= 0) & (g_j >= 0)).reshape(-1), rank_s, -1)
    entry_slot_sym = np.where(
        rank_s >= 0,
        blk_id_safe[np.maximum(rank_s, 0)] * (block * block) + in_block_s,
        n_values,
    )
    mark("sym_slots")

    # block-transpose partner: mirror (cb, rb) of every stored block (self
    # for diagonals); padding slots stay self-paired so they remain zero
    trank = np.searchsorted(bkeys, ubc * nb + ubr)
    S_blocks = nb * B + nh * B2
    tpartner = np.arange(S_blocks, dtype=np.int64)
    tpartner[blk_id] = blk_id[trank]
    mark("tpartner")

    i_t = config.index_dtype()
    structure = BSRStructure(
        bcols=jnp.asarray(bcols, dtype=i_t),
        entry_slot=jnp.asarray(entry_slot, dtype=i_t),
        perm=perm,
        inner_perm=inner_perm,
        n_inner=n_inner,
        n_pad=int(n_pad),
        nb=int(nb),
        block=int(block),
        n_values=n_values,
        bcols2=jnp.asarray(bcols2, dtype=i_t),
        heavy_rows=jnp.asarray(heavy_rows, dtype=i_t),
        entry_slot_sym=jnp.asarray(entry_slot_sym, dtype=i_t),
        tpartner=jnp.asarray(tpartner, dtype=i_t),
        ubr_host=ubr,
        ubc_host=ubc,
        blk_id_host=blk_id,
    )
    if profile:
        for a in (structure.entry_slot, structure.entry_slot_sym):
            np.asarray(a)  # force the device push into this timing window
        mark("device_push")
        spans = ", ".join(
            f"{name}={t1 - t0:.2f}s"
            for (_, t0), (name, t1) in zip(marks, marks[1:])
        )
        print(f"[bsr-build] n_inner={n_inner} T={dofs.shape[0]}: {spans}",
              flush=True)
    return structure


def bsr_values_from_local(structure: BSRStructure, local_matrices):
    """Assemble element matrices into the block layout.

    One scatter-add in original entry order; boundary-touching entries carry
    an out-of-range slot and are dropped by ``mode='drop'``. Returns
    ``(tier1, tier2)``: ``(nb, B, k, k)`` and ``(nh, B2, k, k)`` (tier2
    empty without ``max_b``).
    """
    flat = local_matrices.reshape(-1)
    values = (
        jnp.zeros((structure.n_values,), dtype=flat.dtype)
        .at[structure.entry_slot]
        .add(flat, mode="drop")
    )
    nb, B = structure.bcols.shape
    nh, B2 = structure.bcols2.shape
    k = structure.block
    split = nb * B * k * k
    return (
        values[:split].reshape(nb, B, k, k),
        values[split:].reshape(nh, B2, k, k),
    )


def bsr_values_from_local_symmetric(structure: BSRStructure, local_matrices):
    """Assemble *symmetric* element matrices with 1/3 fewer scattered entries.

    Scatters one value per unordered local DOF pair (n_loc*(n_loc+1)/2 per
    element instead of n_loc^2) into the canonical (row-block <= col-block)
    slot, then completes every mirror block on device:

        V = L + transpose_in_block(L[tpartner])

    followed by halving the doubled scalar diagonal of the diagonal blocks.
    The completion is one block-row gather (64-wide rows, charged per
    descriptor) — far cheaper than the T*n_loc^2/3 scatter elements it
    replaces (measured 22.3 -> ~15 ms at 107k DOFs). Only valid when
    ``local_matrices`` are symmetric (e.g. stiffness/mass forms); use
    ``bsr_values_from_local`` for general bilinear forms.
    """
    n_loc = local_matrices.shape[-1]
    iu, ju = np.triu_indices(n_loc)
    # local (i, i) pairs are exactly the global diagonal scalars (element
    # DOFs are distinct), which the self-partnered transpose doubles: halve
    # them pre-scatter with a static mask — free, fused into the pack
    w = jnp.asarray(np.where(iu == ju, 0.5, 1.0), dtype=local_matrices.dtype)
    local_sym = (local_matrices[..., iu, ju] * w).reshape(-1)
    values = (
        jnp.zeros((structure.n_values,), dtype=local_sym.dtype)
        .at[structure.entry_slot_sym]
        .add(local_sym, mode="drop")
    )
    return bsr_complete_symmetric(structure, values)


def bsr_complete_symmetric(structure: BSRStructure, values):
    """Mirror-complete canonically scattered symmetric values.

    ``values`` is the flat (n_values,) buffer holding each unordered DOF
    pair's contribution in its canonical (row-block <= col-block) slot,
    with the scalar diagonal pre-halved (see
    ``bsr_values_from_local_symmetric``, which packs+scatters and then
    calls this). Exposed separately so chunked/streaming assembly paths
    (huge meshes where the (T, n_loc, n_loc) local temp would blow the
    TPU tile padding) can scatter incrementally and complete once.
    """
    k = structure.block
    nb, B = structure.bcols.shape
    nh, B2 = structure.bcols2.shape
    # mirror completion: gather partners as flat 64-wide rows (measured
    # 3.7 ms vs 5.5 ms for gathering (8, 8) blocks) and transpose the copy
    # as a static 64-column permutation — staying in (N, k*k) form keeps
    # the TPU (8, 128) tile padding at 2x, where an (N, 8, 8) intermediate
    # pads 16x (an 11.6 GB temp at the 2M-DOF scale, measured HBM OOM)
    tperm = jnp.asarray(
        np.arange(k * k).reshape(k, k).T.reshape(-1), dtype=jnp.int32
    )
    flat = values.reshape(-1, k * k)
    full = flat + flat[structure.tpartner][:, tperm]
    v1 = full[: nb * B].reshape(nb, B, k, k)
    v2 = full[nb * B :].reshape(nh, B2, k, k)
    return v1, v2


def bsr_matvec(structure: BSRStructure, values, x):
    """y = A @ x via block row-gather + batched 8x8 matvec.

    ``x`` is the permuted padded vector (n_pad,). Padding blocks point at
    block 0 with all-zero values, so they contribute nothing. The tier-2
    contribution (spilled blocks of heavy rows) rejoins with one small
    sorted row scatter-add (~free: scatters are charged per row descriptor).

    Tier-1 slot b=0 is by construction the own block, so its x-block is
    read with a straight reshape instead of a gather — nb fewer gather
    descriptors per SpMV (measured 1714 -> 1603 us/PCG-iteration on the
    107k-DOF benchmark).

    Mixed precision: when ``values`` are stored reduced (bf16), x is cast
    down to match and the einsum accumulates back in x.dtype. Safe for
    preconditioner-internal operators (the preconditioner only needs to
    approximate A). Reducing the PCG matvec itself
    (``compiled_bsr_solver(values_dtype=...)``) solves a *perturbed*
    system: the residual converges against the bf16 operator while the
    solution sits ~1e-3 relative from the f32 answer (measured,
    docs/performance.md) — an expert accuracy/bandwidth trade, off by
    default.
    """
    v1, v2 = values
    x2 = x.reshape(structure.nb, structure.block)
    xg = x2 if v1.dtype == x2.dtype else x2.astype(v1.dtype)
    y = jnp.einsum("rij,rj->ri", v1[:, 0], xg, preferred_element_type=x.dtype)
    y = y + jnp.einsum(
        "rbij,rbj->ri",
        v1[:, 1:],
        xg[structure.bcols[:, 1:]],
        preferred_element_type=x.dtype,
    )
    if structure.heavy_rows.shape[0]:
        y2 = jnp.einsum(
            "rbij,rbj->ri",
            v2,
            xg[structure.bcols2],
            preferred_element_type=x.dtype,
        )
        y = y.at[structure.heavy_rows].add(
            y2, indices_are_sorted=True, unique_indices=True
        )
    return y.reshape(-1)


def bsr_matvec_cols(structure: BSRStructure, values, X):
    """Y = A @ X for a MULTI-COLUMN operand X (n_pad, m).

    The hot use is the component-decoupled Stokes A block, where the
    vector Laplacian is the scalar operator applied to n_components
    simultaneous right-hand sides: the operator VALUES stream once for
    all m columns (the interleaved vector BSR stores every block twice
    with zero cross-component entries). MEASURED CAVEAT (round-5 on-chip
    A/B, docs/performance.md): the original per-descriptor-gather
    hypothesis did NOT hold — a lockstep iteration at m=2 costs ~2.2 ms
    vs the interleaved vector path's ~1.1 ms at the same 107k-DOF scale
    (the gathered (k, m) payload is charged per element, and the (n, m)
    trailing-dim layout lane-pads every vector op m->128). The multi-rhs
    path still wins SWEEPS (the per-component scalar preconditioner is
    much finer under the same dense-coarse cap: 462 lockstep vs 709
    interleaved iterations), but loses wall-clock; prefer the interleaved
    path with precondition='agg_comp' until a lane-tax-free multi-column
    layout exists.
    """
    v1, v2 = values
    m = X.shape[-1]
    x2 = X.reshape(structure.nb, structure.block, m)
    xg = x2 if v1.dtype == x2.dtype else x2.astype(v1.dtype)
    y = jnp.einsum(
        "rij,rjm->rim", v1[:, 0], xg, preferred_element_type=X.dtype
    )
    y = y + jnp.einsum(
        "rbij,rbjm->rim",
        v1[:, 1:],
        xg[structure.bcols[:, 1:]],
        preferred_element_type=X.dtype,
    )
    if structure.heavy_rows.shape[0]:
        y2 = jnp.einsum(
            "rbij,rbjm->rim",
            v2,
            xg[structure.bcols2],
            preferred_element_type=X.dtype,
        )
        y = y.at[structure.heavy_rows].add(
            y2, indices_are_sorted=True, unique_indices=True
        )
    return y.reshape(-1, m)


def bsr_diagonal(structure: BSRStructure, values):
    """Operator diagonal (own block is always at b=0); padded rows -> 0."""
    return jnp.diagonal(values[0][:, 0], axis1=-2, axis2=-1).reshape(-1)


def bsr_reduce(structure: BSRStructure, b):
    """Full load vector (n_dofs,...) -> permuted padded reduced rhs (n_pad,)."""
    b = b.reshape(-1)
    red = b[jnp.asarray(structure.inner_perm)]
    return jnp.pad(red, (0, structure.n_pad - structure.n_inner))


def bsr_reduce_cols(structure: BSRStructure, B):
    """Multi-column twin of :func:`bsr_reduce`: (n_dofs, m) -> (n_pad, m)."""
    red = B[jnp.asarray(structure.inner_perm)]
    return jnp.pad(red, ((0, structure.n_pad - structure.n_inner), (0, 0)))


def bsr_expand_cols(structure: BSRStructure, X, n_dofs: int):
    """Multi-column twin of :func:`bsr_expand`: (n_pad, m) -> (n_dofs, m)."""
    full = jnp.zeros((n_dofs, X.shape[-1]), dtype=X.dtype)
    return full.at[jnp.asarray(structure.inner_perm)].set(
        X[: structure.n_inner]
    )


def inverse_inner_perm(
    structure: BSRStructure, n_dofs: int, sentinel: int | None = None
):
    """Host map dof -> position in the permuted padded reduced vector.

    The single place the reduced layout's inverse permutation is built:
    DOFs not in ``inner_perm`` (boundary/eliminated) map to ``sentinel``
    (default ``n_pad``, one past the end, so jnp ``.at[...]`` scatters in
    ``drop`` mode discard them). Row-sharded callers pass the global padded
    length (``lrows * n_shards``) instead. Keeping this in one helper pins
    the layout invariant for the direct-to-padded rhs scatter
    (ops/compiled.py), the benchmark twin (bench.py) and the shard plan
    (parallel/sharded_bsr.py).
    """
    inner_perm = np.asarray(structure.inner_perm)
    if sentinel is None:
        sentinel = structure.n_pad
    inv = np.full((int(n_dofs),), sentinel, dtype=np.int64)
    inv[inner_perm] = np.arange(inner_perm.shape[0], dtype=np.int64)
    return inv


def bsr_expand(structure: BSRStructure, x, n_dofs: int):
    """Permuted padded solution (n_pad,) -> full DOF vector (n_dofs, 1)."""
    full = jnp.zeros((n_dofs,), dtype=x.dtype)
    full = full.at[jnp.asarray(structure.inner_perm)].set(x[: structure.n_inner])
    return full[:, None]


def default_max_b(basis) -> int:
    """Dimension-aware tier-1 block cap for the hybrid layout.

    The cap trades tier-1 padding against tier-2 spill, and the right value
    tracks the mean block degree, which tracks the REFERENCE element
    dimension (not the embedding: DFN fractures live in 3D coordinates but
    are topologically 2D, mean degree ~7.6). Measured: 2D benchmark wants 8
    (docs/performance.md); 3D tets carry mean degree ~18 and max_b=24 cuts
    s/iter 26% at 1M DOFs (48.1 -> 35.7 ms, identical solution).
    """
    # shape-only read: the property creates its array on access, so under a
    # trace (e.g. solve_iterative used as a Schur-complement matvec inside
    # lax.while_loop, ops/saddle.py) materializing it would fail
    ref_dim = int(basis._element.barycentric_grad.shape[-1])
    return 24 if ref_dim >= 3 else 8


def get_bsr_structure(
    basis,
    block: int = 8,
    leaf: int = 32,
    max_b: int | None = None,
    want_entry_slot: bool = True,
) -> BSRStructure:
    """Cached-per-basis BSR layout, keyed by (block, leaf, max_b).

    A cached symmetric-only structure (built with ``want_entry_slot=False``)
    is upgraded in place when a caller later needs the full entry table.
    """
    cache = getattr(basis, "_bsr_structures", None)
    if cache is None:
        cache = {}
        basis._bsr_structures = cache
    key = (block, leaf, max_b)
    structure = cache.get(key)
    if structure is not None and want_entry_slot and structure.entry_slot.size == 0:
        structure = None  # symmetric-only cached; rebuild with the table
    if structure is None:
        inner = np.asarray(basis._basis_parameters["inner_dofs"])
        coords = np.asarray(basis._coords4global_dofs)[inner]
        structure = build_bsr_structure(
            basis._global_dofs4elements,
            basis.n_dofs,
            inner,
            coords,
            block=block,
            leaf=leaf,
            max_b=max_b,
            want_entry_slot=want_entry_slot,
        )
        cache[key] = structure
    return structure
