"""Two-level (aggregation-deflation) preconditioner for the reduced system.

Plain Jacobi leaves the low-frequency error modes to CG, costing O(1/h)
iterations. A coarse correction over piecewise-constant aggregates removes
them:

    M^{-1} r = D^{-1} r + R A_c^{-1} R^T r,      A_c = R^T A R

with aggregates chosen as *contiguous, equal-size index blocks* so that on
TPU the restriction/prolongation are reshape-reduces and broadcasts — zero
gathers — and the coarse solve is one small dense matmul against a
precomputed inverse. The additive combination of two SPD operators is SPD,
so CG theory applies unchanged.

Index-contiguous aggregates work because mesh construction orders vertices
with strong spatial locality (structured grids row-major, PSLG meshes by
generation front); even imperfect aggregates deflate enough low modes to cut
iteration counts several-fold.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .sparse import ELLStructure, invert_scatter_map


def _mixed_matvec(eq, mat, vec, out_dtype):
    """einsum that tolerates reduced-precision (bf16) dense operands.

    The preconditioner only shapes the CG search directions — it never
    touches the converged answer — so its dense operands can be stored in
    bf16 (halving the HBM traffic of the coarse matvec, the dominant apply
    cost at ~100k DOFs) with the accumulation kept in the residual dtype.
    Measured: identical iteration counts, 1714 -> 1588 us/iteration on the
    107k-DOF DFN benchmark.
    """
    if mat.dtype == vec.dtype:
        return jnp.einsum(eq, mat, vec)
    return jnp.einsum(
        eq, mat, vec.astype(mat.dtype), preferred_element_type=out_dtype
    )



def spd_inverse(a):
    """Explicit inverse of a (shifted) SPD matrix via Cholesky.

    ``jnp.linalg.inv`` lowers to LU + solve-against-identity, measured
    13.4 ms at n=3248 f32 on the target TPU; the Cholesky route
    (potrf -> triangular solve against I -> L^{-T} L^{-1} gemm) measures
    7.6 ms — a ~1.8x cut of the single largest piece of the benchmark's
    per-solve preconditioner setup (tools/exp_setup_breakdown.py). Callers
    pass the already-regularized coarse Galerkin matrix (the 1e-7 trace
    shift keeps all-padding aggregates positive definite), so the factor
    exists on every SPD path; preconditioner quality is unchanged
    (identical iteration counts in the on-chip A/B, docs/performance.md).

    Non-SPD inputs do occur: ``compiled_newton_solver`` symmetrizes the
    per-step Jacobian's coarse Galerkin matrix, and 0.5*(C+C^T) of a
    strongly non-symmetric Jacobian can be indefinite despite the trace
    shift. ``jnp.linalg.cholesky`` does not raise there — it fills the
    factor with NaN — so a finite-factor guard falls back to the LU-based
    inverse (the pre-round-4 behavior: a usable, if weaker,
    preconditioner instead of an all-NaN one that poisons every Krylov
    iterate).
    """
    from jax.scipy.linalg import solve_triangular

    n = a.shape[-1]
    chol = jnp.linalg.cholesky(a)

    def via_cholesky(_):
        l_inv = solve_triangular(chol, jnp.eye(n, dtype=a.dtype), lower=True)
        return l_inv.T @ l_inv

    return jax.lax.cond(
        jnp.all(jnp.isfinite(chol)),
        via_cholesky,
        lambda _: jnp.linalg.inv(a),
        None,
    )


def _prolong(z_c, g: int, n: int):
    """Piecewise-constant prolongation: repeat each coarse value g times.

    Implemented as broadcast + reshape, NOT ``jnp.repeat``: measured on the
    target TPU the repeat lowers ~640 us/op at n=104k while the broadcast
    is free (tools/exp_coarse_apply.py) — it was the single largest
    non-SpMV cost in the PCG iteration.
    """
    return jnp.broadcast_to(z_c[..., :, None], z_c.shape + (g,)).reshape(
        z_c.shape[:-1] + (n,)
    )

def _apply_fine(blk_inv, inv_diag, r):
    """Fine smoother application: batched block-Jacobi or point Jacobi."""
    if blk_inv is None:
        return inv_diag * r
    k = blk_inv.shape[-1]
    return _mixed_matvec(
        "rij,rj->ri", blk_inv, r.reshape(-1, k), r.dtype
    ).reshape(-1)


class TwoLevelPreconditioner(NamedTuple):
    inv_diag: jnp.ndarray  # (n,)
    coarse_inv: jnp.ndarray  # (nb, nb) dense inverse of R^T A R
    block: int
    n: int
    n_pad: int

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        fine = self.inv_diag * r
        r_pad = jnp.concatenate(
            [r, jnp.zeros((self.n_pad - self.n,), dtype=r.dtype)]
        )
        r_coarse = r_pad.reshape(-1, self.block).sum(axis=-1)
        z_coarse = self.coarse_inv @ r_coarse
        z_pad = _prolong(z_coarse, self.block, self.n_pad)
        return fine + z_pad[: self.n]


def spatial_aggregates(coords: np.ndarray, leaf: int = 32) -> np.ndarray:
    """Cluster points into spatial aggregates of <= leaf by coordinate
    bisection. Returns (n,) aggregate ids (contiguous, 0..n_agg-1)."""
    coords = np.asarray(coords)
    n = coords.shape[0]
    agg = np.zeros(n, dtype=np.int64)
    counter = [0]

    def bisect(idx):
        if len(idx) <= leaf:
            agg[idx] = counter[0]
            counter[0] += 1
            return
        spans = coords[idx].max(0) - coords[idx].min(0)
        ax = int(np.argmax(spans))
        order = idx[np.argsort(coords[idx, ax], kind="stable")]
        half = len(order) // 2
        bisect(order[:half])
        bisect(order[half:])

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 64 + int(2 * np.log2(max(n, 2)))))
    try:
        bisect(np.arange(n))
    finally:
        sys.setrecursionlimit(old_limit)
    return agg


class BlockTwoLevel(NamedTuple):
    """M^{-1} = D^{-1} + P0 A_c^{-1} P0^T on a BSR-permuted system.

    The BSR layout (``ops.bsr``) orders unknowns by spatial bisection
    clusters, so piecewise-constant aggregates can be *contiguous fixed-size
    groups*: restriction is a reshape-sum and prolongation a repeat — zero
    gathers per iteration, vs the n*kp scalar gathers of ``SmoothedTwoLevel``.
    The coarse solve is one dense (nc, nc) matvec against a precomputed
    inverse. Additive combination of SPD terms, so CG theory applies.
    """

    inv_diag: jnp.ndarray  # (n_pad,) point-Jacobi; unused when blk_inv set
    coarse_inv: jnp.ndarray  # (nc, nc)
    g: int  # aggregate size (fine DOFs per coarse unknown)
    blk_inv: jnp.ndarray | None = None  # (nb, k, k) block-Jacobi inverses

    def coarse_apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """P0 A_c^{-1} P0^T r — restriction/prolongation are reshapes."""
        r_c = r.reshape(-1, self.g).sum(axis=-1)
        z_c = _mixed_matvec("ij,j->i", self.coarse_inv, r_c, r.dtype)
        return _prolong(z_c, self.g, r.shape[0])

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        return _apply_fine(self.blk_inv, self.inv_diag, r) + self.coarse_apply(r)


def _fine_block_smoother(v1, block, fine="block_jacobi", operand_dtype=None):
    """Diagonal-block inverses for the fine smoother (None for point Jacobi).

    Padded rows carry all-zero diagonal blocks: their diagonals are pinned
    to identity so the batched inverse stays finite (their residual is
    identically zero, so the value never matters).
    """
    if fine == "jacobi":
        return None
    if fine != "block_jacobi":
        raise ValueError(f"unknown fine smoother: {fine!r}")
    blk = v1[:, 0]  # the diagonal block always lives at tier-1 slot b=0
    zero_d = jnp.diagonal(blk, axis1=-2, axis2=-1) == 0
    blk = blk + jnp.eye(block, dtype=blk.dtype) * zero_d[:, None, :]
    blk_inv = batched_small_inv(blk)
    if operand_dtype is not None:
        blk_inv = blk_inv.astype(operand_dtype)
    return blk_inv


def batched_small_inv(a: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of small SPD matrices via unrolled Gauss-Jordan.

    ``jnp.linalg.inv`` lowers to a batched LU that costs ~30 ms for 13k 8x8
    blocks on the target TPU; this unrolled elimination is pure elementwise
    VPU work (~1 ms). No pivoting — the intended inputs are SPD diagonal
    blocks of an assembled stiffness operator, where diagonal pivots are the
    stable choice anyway (Cholesky-grade growth bounds).
    """
    n = a.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), a.shape)
    aug = jnp.concatenate([a, eye], axis=-1)  # (..., n, 2n)
    for k in range(n):
        pivot_row = aug[..., k, :] / aug[..., k, k : k + 1]
        aug = aug - aug[..., :, k : k + 1] * pivot_row[..., None, :]
        aug = aug.at[..., k, :].set(pivot_row)
    return aug[..., n:]


# Policy constants shared with ops.bsr's padding (build_bsr_structure pads
# n_pad so that every power-of-two multiple of BASE_AGGREGATE_BLOCKS*block
# up to the size these policies select divides it — including the affine
# space's 1+d-times-larger aggregates).
MAX_COARSE = 4096  # dense coarse-level cap (inverse + per-iteration matvec)
BASE_AGGREGATE_BLOCKS = 4  # one aggregate = 4 blocks (32 DOFs) minimum
AFFINE_MAX_VECTORS = 4  # [1, x, y, z]: m = 1 + d <= 4


def _bounded_divisor_search(n_pad: int, base: int, mult0: int) -> int:
    """Smallest mult >= mult0 with (base*mult) | n_pad, degeneration-proof.

    An n_pad with no small factors would otherwise walk mult to n_pad/base
    — a one-unknown coarse level, i.e. silent Jacobi (the 245k-DOF bug).
    The search is bounded at 4*mult0 and falls back downward: an oversized
    dense coarse level is strictly better than a degenerate one.
    """
    mult = max(mult0, 1)
    while n_pad % (base * mult) and mult < 4 * max(mult0, 1):
        mult += 1
    if n_pad % (base * mult):
        for cand in range(max(mult0, 1), 0, -1):
            if n_pad % (base * cand) == 0:
                return base * cand
        return base
    return base * mult


def default_aggregate_size(structure, max_coarse: int = MAX_COARSE) -> int:
    """Aggregate size keeping the dense coarse level at <= max_coarse.

    g = 32 is the sweet spot on ~100k-DOF problems, but a fixed g lets the
    coarse level grow linearly with n: at n_pad = 4M the (nc, nc) inverse
    would be 16k^2. Scale g (in whole multiples of 32 fine DOFs = 4 blocks)
    so nc stays bounded; iteration counts grow mildly (~15% per doubling of
    g on the DFN benchmark) while the coarse matvec/inverse stay flat.
    """
    base = BASE_AGGREGATE_BLOCKS * structure.block
    mult0 = -(-structure.n_pad // (max_coarse * base))
    return _bounded_divisor_search(structure.n_pad, base, mult0)


def block_two_level_from_values(
    structure,
    values,
    diag,
    g: int | None = None,
    fine: str = "block_jacobi",
    operand_dtype=None,
):
    """Jittable numeric setup of the block two-level preconditioner.

    Every 8x8 value block lies entirely inside one (coarse row, coarse col)
    pair because aggregates are whole groups of blocks, so the Galerkin
    coarse matrix P0^T A P0 is a segment-sum of per-block sums — nb*B
    scattered scalars, ~64x fewer than the entry-level ELL path.

    Args:
      structure: ``ops.bsr.BSRStructure`` (requires g % block == 0 and
        n_pad % g == 0, guaranteed by the builder's pad_to).
      values: assembled (nb, B, block, block) BSR values.
      diag: operator diagonal (n_pad,) (zeros on padded rows are safe).
      g: aggregate size; larger -> cheaper coarse solve, more iterations.
        None (default) picks ``default_aggregate_size`` (32 up to ~130k
        DOFs, scaling so the dense coarse level stays <= 4096).
      fine: "block_jacobi" (default) inverts the 8x8 diagonal blocks — a
        strictly stronger smoother than point Jacobi (~12% fewer CG
        iterations on the DFN benchmark) whose apply is one batched 8x8
        matvec, still zero gathers; "jacobi" uses the point diagonal.
      operand_dtype: storage dtype for the dense apply operands (coarse
        inverse + block inverses); ``jnp.bfloat16`` halves the coarse
        matvec's HBM traffic at unchanged iteration counts (see
        ``_mixed_matvec``). None keeps the values dtype.
    """
    block = structure.block
    if g is None:
        g = default_aggregate_size(structure)
    if g < block or g % block or structure.n_pad % g:
        raise ValueError(
            f"aggregate size {g} must be a multiple of block {block} "
            f"(>= {block}) and divide n_pad {structure.n_pad}"
        )
    bpa = g // block
    nc = structure.n_pad // g
    if nc > 8192:
        # the dense (nc, nc) coarse Cholesky needs O(nc^2) HBM temps: at
        # nc=12992 XLA's blocked triangular solve demanded 33.5 GB on a
        # 16 GB chip (measured OOM, 2026-08-19). Fail with guidance
        # instead of a compile-time OOM wall.
        raise ValueError(
            f"coarse dimension n_pad/g = {nc} too large for the dense "
            f"two-level coarse solve (> 8192); use a larger aggregate "
            f"size g or the sparse three-level preconditioner"
        )
    nb, B = structure.bcols.shape

    v1, v2 = values
    rows_c = (jnp.arange(nb, dtype=structure.bcols.dtype) // bpa)[:, None]
    bins = (rows_c * nc + structure.bcols // bpa).reshape(-1)
    block_sums = v1.sum(axis=(-1, -2)).reshape(-1)
    coarse = jax.ops.segment_sum(block_sums, bins, num_segments=nc * nc)
    if structure.heavy_rows.shape[0]:
        bins2 = (
            (structure.heavy_rows // bpa)[:, None] * nc
            + structure.bcols2 // bpa
        ).reshape(-1)
        coarse = coarse + jax.ops.segment_sum(
            v2.sum(axis=(-1, -2)).reshape(-1), bins2, num_segments=nc * nc
        )
    coarse = coarse.reshape(nc, nc)
    coarse = 0.5 * (coarse + coarse.T)
    # aggregates made purely of padding rows are all-zero: shift keeps the
    # inverse finite without affecting preconditioning quality
    shift_scale = jnp.maximum(jnp.trace(coarse) / nc, 1.0)
    coarse_inv = spd_inverse(
        coarse + 1e-7 * shift_scale * jnp.eye(nc, dtype=coarse.dtype)
    )

    safe = jnp.where(diag != 0, diag, 1.0)
    blk_inv = _fine_block_smoother(v1, block, fine, operand_dtype)
    if operand_dtype is not None:
        coarse_inv = coarse_inv.astype(operand_dtype)
    return BlockTwoLevel(
        inv_diag=1.0 / safe, coarse_inv=coarse_inv, g=g, blk_inv=blk_inv
    )


class AggBlockTwoLevel(NamedTuple):
    """M^{-1} = D_g^{-1} + P0 A_c^{-1} P0^T with aggregate-sized (g x g)
    diagonal-block smoothing.

    Strictly stronger than the 8x8 block-Jacobi fine smoother of
    ``BlockTwoLevel``: D_g is the block diagonal over the SAME contiguous
    g-aggregates the coarse space uses, so the smoother resolves all
    intra-aggregate coupling exactly and the coarse level only carries the
    inter-aggregate error. The apply stays gather-free (one batched
    (nc, g, g) matvec per iteration — n_pad*g MACs, trivial); setup adds
    one block-row gather of the in-aggregate value blocks plus a batched
    g x g inverse per solve.
    """

    inv_agg: jnp.ndarray  # (ns, gs, gs) smoother diagonal-block inverses
    coarse_inv: jnp.ndarray  # (nc, nc)
    g: int  # coarse aggregate size
    gs: int  # smoother block size (>= g allowed; both divide n_pad)

    def coarse_apply(self, r: jnp.ndarray) -> jnp.ndarray:
        r_c = r.reshape(-1, self.g).sum(axis=-1)
        z_c = _mixed_matvec("ij,j->i", self.coarse_inv, r_c, r.dtype)
        return _prolong(z_c, self.g, r.shape[0])

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        fine = _mixed_matvec(
            "rij,rj->ri", self.inv_agg, r.reshape(-1, self.gs), r.dtype
        ).reshape(-1)
        return fine + self.coarse_apply(r)


def build_agg_block_table(structure, g: int) -> np.ndarray:
    """(nc, bpa, bpa) host table: flat value-block id of each in-aggregate
    block pair (sentinel = one past the last block -> a zero block appended
    by the consumer). Uses the builder's stored block-pair tables."""
    k = structure.block
    if g < k or g % k or structure.n_pad % g:
        raise ValueError(
            f"aggregate size {g} must be a multiple of block {k} (>= {k}) "
            f"and divide n_pad {structure.n_pad}"
        )
    bpa = g // k
    nc = structure.n_pad // g
    nb, B = structure.bcols.shape
    nh, B2 = structure.bcols2.shape
    sentinel = nb * B + nh * B2
    blk_id = structure.blk_id_host
    # ubr/ubc are stored decoded so the table stays valid on row-padded
    # copies of the structure (the sharded path _replaces nb/n_pad)
    ubr = structure.ubr_host
    ubc = structure.ubc_host
    agg_r = ubr // bpa
    in_agg = (ubc // bpa) == agg_r
    table = np.full((nc, bpa, bpa), sentinel, dtype=np.int64)
    table[agg_r[in_agg], (ubr % bpa)[in_agg], (ubc % bpa)[in_agg]] = blk_id[
        in_agg
    ]
    return table


def agg_block_two_level_from_values(
    structure,
    values,
    diag,
    g: int | None = None,
    gs: int | None = None,
    table: np.ndarray | None = None,
    operand_dtype=None,
):
    """Jittable numeric setup of the aggregate-block two-level M.

    Same Galerkin coarse level as ``block_two_level_from_values``; the fine
    smoother inverts the (gs, gs) aggregate diagonal blocks instead of the
    (8, 8) ones. ``gs`` (default ``g``) may exceed the coarse aggregate
    size to strengthen the smoother independently of the coarse space —
    both must divide n_pad (guaranteed for power-of-two multiples of the
    base aggregate by the builder's padding). ``table`` may be precomputed
    via ``build_agg_block_table`` (host, value-independent, cacheable).
    """
    base = block_two_level_from_values(
        structure, values, diag, g=g, fine="jacobi", operand_dtype=operand_dtype
    )
    g = base.g
    # default smoother size tracks the aggregate but caps at 128: the table
    # holds bpa^2 = (gs/8)^2 blocks per aggregate, so gs=256 would gather
    # ~1G floats of in-aggregate blocks at the ~1M-DOF scale
    gs = min(g, 128) if gs is None else gs
    inv_agg = aggregate_block_inverses(
        structure, values, gs, table=table, operand_dtype=operand_dtype
    )
    return AggBlockTwoLevel(
        inv_agg=inv_agg, coarse_inv=base.coarse_inv, g=g, gs=gs
    )


def aggregate_block_inverses(
    structure, values, gs: int, table=None, operand_dtype=None
):
    """(ns, gs, gs) inverses of the aggregate diagonal blocks — the
    aggregate-block fine smoother shared by ``AggBlockTwoLevel`` and the
    affine/RBM two-level (``fine="agg_block"``)."""
    if gs % structure.block or structure.n_pad % gs:
        raise ValueError(
            f"smoother block size {gs} must be a multiple of "
            f"block {structure.block} and divide n_pad {structure.n_pad}"
        )
    k = structure.block
    if table is None:
        table = build_agg_block_table(structure, gs)
    v1, v2 = values
    # gather 64-wide flat rows, NOT (k, k) blocks: the TPU (8, 128) tile
    # layout pads an 8-wide last axis 16x, which blows the gather buffer to
    # ~15 GB at the 1M-DOF scale (measured OOM); 64-wide rows pad only 2x
    flat = jnp.concatenate(
        [
            v1.reshape(-1, k * k),
            v2.reshape(-1, k * k),
            jnp.zeros((1, k * k), dtype=v1.dtype),
        ],
        axis=0,
    )
    rows = flat[jnp.asarray(table)]  # (ns, bpa, bpa, k*k)
    bpa = gs // k
    blocks = rows.reshape(-1, bpa, bpa, k, k)
    D = blocks.transpose(0, 1, 3, 2, 4).reshape(-1, gs, gs)
    # padding rows carry zero diagonals: pin to identity (their residual is
    # identically zero, the value never matters)
    zero_d = jnp.diagonal(D, axis1=-2, axis2=-1) == 0
    D = D + jnp.eye(gs, dtype=D.dtype) * zero_d[:, None, :]
    inv_agg = batched_small_inv(D)
    if operand_dtype is not None:
        inv_agg = inv_agg.astype(operand_dtype)
    return inv_agg


class ThreeLevelStructure(NamedTuple):
    """Host-built tables for the additive 3-level preconditioner.

    The intermediate coarse matrix A_c = P1^T A P1 (g1-aggregates) is kept
    *sparse*: aggregate adjacency is ~9-15 entries/row, so assembling it
    dense (nc1^2 entries per solve) costs more than the iteration savings —
    measured 1.42 s vs 1.60 s at 437k DOFs despite 224 vs 644 iterations.
    These tables let the device assemble A_c's unique entries with one
    compact scatter and gather its g2 x g2 diagonal blocks directly.
    """

    slot_of_block: jnp.ndarray  # (nb*B,) coarse slot per tier-1 block
    slot_of_block2: jnp.ndarray  # (nh*B2,) coarse slot per tier-2 block
    diag_take: jnp.ndarray  # (ncb, g2, g2) coarse slot per mid-diag entry
    acc_bins: jnp.ndarray  # (S,) bottom-level bin per coarse entry
    n_slots: int
    nc1: int
    nc1p: int
    ncb: int
    g1: int
    g2: int


class ThreeLevel(NamedTuple):
    """M^{-1} = B^{-1} + P1 (B_c^{-1} + P2 A_cc^{-1} P2^T) P1^T.

    Additive three-level hierarchy over contiguous aggregates: block-Jacobi
    at the fine level (8x8), block-Jacobi at the intermediate level (g2 x g2
    diagonal blocks of the sparse A_c), dense inverse only at the tiny
    bottom level (nc1/g2 unknowns). All transfers are reshapes/repeats.
    Weaker per iteration than the exact two-level (140-176 vs 83 iterations
    at 107k DOFs) but unboundedly scalable: at 437k DOFs it takes 224
    iterations where the coarse-capped two-level needs 644.
    """

    blk_inv: jnp.ndarray  # (nb, k, k) fine diagonal-block inverses
    mblk_inv: jnp.ndarray  # (ncb, g2, g2) intermediate block inverses
    acc_inv: jnp.ndarray  # (ncb, ncb) bottom-level dense inverse
    g1: int
    g2: int
    nc1: int
    nc1p: int

    def coarse_apply(self, r: jnp.ndarray) -> jnp.ndarray:
        """P1 (B_c^{-1} + P2 A_cc^{-1} P2^T) P1^T r — transfers are reshapes."""
        r_c = jnp.pad(
            r.reshape(-1, self.g1).sum(axis=-1), (0, self.nc1p - self.nc1)
        )
        mid = _mixed_matvec(
            "rij,rj->ri", self.mblk_inv, r_c.reshape(-1, self.g2), r.dtype
        ).reshape(-1)
        z_cc = _mixed_matvec(
            "ij,j->i", self.acc_inv, r_c.reshape(-1, self.g2).sum(axis=-1), r.dtype
        )
        z_c = (
            mid + _prolong(z_cc, self.g2, self.nc1p)
        )[: self.nc1]
        return _prolong(z_c, self.g1, r.shape[0])

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        return _apply_fine(self.blk_inv, None, r) + self.coarse_apply(r)


def build_three_level_structure(
    structure, g1: int = 32, g2: int = 32
) -> ThreeLevelStructure:
    """Host-side once-per-basis tables for the sparse-coarse 3-level M."""
    block = structure.block
    if g1 % block or structure.n_pad % g1:
        raise ValueError(
            f"g1={g1} must be a multiple of block {block} and divide "
            f"n_pad {structure.n_pad}"
        )
    bcols = np.asarray(structure.bcols)
    nb, B = bcols.shape
    bpa = g1 // block
    nc1 = structure.n_pad // g1

    rows_c = np.repeat(np.arange(nb) // bpa, B)
    pairs1 = rows_c * nc1 + (bcols // bpa).reshape(-1)
    heavy = np.asarray(structure.heavy_rows)
    bcols2 = np.asarray(structure.bcols2)
    if heavy.size:
        rows2 = np.repeat(heavy // bpa, bcols2.shape[1])
        pairs2 = rows2 * nc1 + (bcols2 // bpa).reshape(-1)
    else:
        pairs2 = np.zeros((0,), dtype=np.int64)

    upairs, inv = np.unique(
        np.concatenate([pairs1, pairs2]), return_inverse=True
    )
    inv = inv.reshape(-1)
    S = int(upairs.size)
    ur = upairs // nc1
    uc = upairs % nc1

    nc1p = -(-nc1 // g2) * g2
    ncb = nc1p // g2
    diag_take = np.full((ncb, g2, g2), S, dtype=np.int64)
    on_diag = (ur // g2) == (uc // g2)
    diag_take[ur[on_diag] // g2, ur[on_diag] % g2, uc[on_diag] % g2] = (
        np.nonzero(on_diag)[0]
    )
    acc_bins = (ur // g2) * ncb + uc // g2

    i_t = config.index_dtype()
    return ThreeLevelStructure(
        slot_of_block=jnp.asarray(inv[: pairs1.size], dtype=i_t),
        slot_of_block2=jnp.asarray(inv[pairs1.size :], dtype=i_t),
        diag_take=jnp.asarray(diag_take, dtype=i_t),
        acc_bins=jnp.asarray(acc_bins, dtype=i_t),
        n_slots=S,
        nc1=int(nc1),
        nc1p=int(nc1p),
        ncb=int(ncb),
        g1=int(g1),
        g2=int(g2),
    )


def get_three_level_structure(
    basis, structure, g1: int = 32, g2: int = 32
) -> ThreeLevelStructure:
    """Cached-per-basis 3-level tables (host-built once per BSR layout)."""
    cache = getattr(basis, "_three_level_structures", None)
    if cache is None:
        cache = {}
        basis._three_level_structures = cache
    key = (structure.nb, structure.bcols.shape[1],
           structure.heavy_rows.shape[0], g1, g2)
    tl = cache.get(key)
    if tl is None:
        tl = build_three_level_structure(structure, g1=g1, g2=g2)
        cache[key] = tl
    return tl


def auto_preconditioner(basis, structure, values, diag, operand_dtype=None):
    """Size-appropriate aggregate preconditioner for the BSR operator.

    Round-2 measured policy: the **aggregate-block two-level**
    (``agg_block_two_level_from_values``) wins at every measured size on
    the DFN benchmark — 72 it/0.170 s at 107k DOFs (g=32), 116 it/0.586 s
    at 245k (g=64), 167 it/1.427 s at 437k (g=128, vs the sparse-coarse
    three-level's 223 it/1.494 s same-day), and 200 it/3.640 s at 980k
    (g=256 with the smoother capped at gs=128). Earlier measured losers
    (multiplicative V(1,1) cycles, smoothed aggregation, bf16 operands)
    are documented in docs/performance.md; the sparse-coarse three-level
    remains available as an explicit option for sizes where the dense
    (nc, nc) coarse inverse eventually outgrows HBM (nc is capped at 4096,
    so that wall is far out).

    Vector bases (``n_components >= 2``, e.g. elasticity) get the
    rigid-body-mode coarse space instead: constants-per-aggregate force
    equal corrections on every displacement component and degrade with
    1/h, while the RBM space spans the operator's near-nullspace
    (measured on the 2D plane-strain plate: see docs/performance.md).
    """
    if int(getattr(basis, "n_components", 1)) >= 2:
        # aggregate size defaults from the mode count inside the builder
        ast = get_affine_two_level_structure(basis, structure, rbm=True)
        return affine_two_level_from_values(
            ast, structure, values, diag, operand_dtype=operand_dtype
        )
    g = default_aggregate_size(structure)
    table = None
    cache = getattr(basis, "_agg_block_tables", None)
    if cache is None:
        cache = {}
        try:
            basis._agg_block_tables = cache
        except AttributeError:  # basis-like without attribute support
            cache = None
    gs = min(g, 128)
    if cache is not None:
        key = (structure.nb, structure.bcols.shape[1], gs)
        table = cache.get(key)
    if table is None:
        table = build_agg_block_table(structure, gs)
        if cache is not None:
            cache[key] = table
    return agg_block_two_level_from_values(
        structure, values, diag, g=g, gs=gs, table=table,
        operand_dtype=operand_dtype,
    )


def three_level_from_values(
    tl: ThreeLevelStructure, structure, values, diag, operand_dtype=None
):
    """Jittable numeric setup of the sparse-coarse 3-level preconditioner.

    ``operand_dtype=jnp.bfloat16`` stores the three dense apply operands
    (fine/mid block inverses, bottom dense inverse) reduced-precision; see
    ``_mixed_matvec``.
    """
    v1, v2 = values
    block = structure.block

    coarse = jnp.zeros((tl.n_slots + 1,), dtype=v1.dtype)
    coarse = coarse.at[tl.slot_of_block].add(v1.sum(axis=(-1, -2)).reshape(-1))
    if structure.heavy_rows.shape[0]:
        coarse = coarse.at[tl.slot_of_block2].add(
            v2.sum(axis=(-1, -2)).reshape(-1)
        )
    # index n_slots is the padding slot: gathering it yields 0
    coarse = coarse.at[tl.n_slots].set(0.0)

    mblocks = coarse[tl.diag_take]  # (ncb, g2, g2)
    zero_d = jnp.diagonal(mblocks, axis1=-2, axis2=-1) == 0
    mblocks = mblocks + jnp.eye(tl.g2, dtype=mblocks.dtype) * zero_d[:, None, :]
    mblk_inv = batched_small_inv(mblocks)

    acc = jax.ops.segment_sum(
        coarse[: tl.n_slots], tl.acc_bins, num_segments=tl.ncb * tl.ncb
    ).reshape(tl.ncb, tl.ncb)
    acc = 0.5 * (acc + acc.T)
    shift = 1e-7 * jnp.maximum(jnp.trace(acc) / tl.ncb, 1.0)
    acc_inv = spd_inverse(acc + shift * jnp.eye(tl.ncb, dtype=acc.dtype))

    blk_inv = _fine_block_smoother(v1, block, "block_jacobi", operand_dtype)

    if operand_dtype is not None:
        mblk_inv = mblk_inv.astype(operand_dtype)
        acc_inv = acc_inv.astype(operand_dtype)
    return ThreeLevel(
        blk_inv=blk_inv,
        mblk_inv=mblk_inv,
        acc_inv=acc_inv,
        g1=tl.g1,
        g2=tl.g2,
        nc1=tl.nc1,
        nc1p=tl.nc1p,
    )


def _smoother_scale(smooth, matvec, n, dtype, iters: int = 12):
    """1/rho(S A) from power iteration — the safe smoother damping.

    The symmetrized multiplicative cycle is SPD iff the smoother is an
    A-contraction (rho(S A) < 2). Undamped block-Jacobi violates that on
    fracture-trace rows once the mesh is fine enough: measured 41
    iterations at h=0.03 but 232 at h=0.02 on the DFN benchmark, where the
    additive combination (which needs no contraction) stayed at 147.
    Scaling S by 1/rho puts the smoothed spectrum in [0, 1]: SPD by
    construction and near-optimal damping of the upper half-spectrum that
    the coarse level cannot see. S A is similar to the SPD matrix
    S^1/2 A S^1/2, so its top eigenvalue is real and power iteration
    converges cleanly; the alternating-sign start overlaps the
    high-frequency end where the top modes live.
    """
    v0 = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0).astype(dtype)

    def body(_, carry):
        v, lam = carry
        w = smooth(matvec(v))
        lam = jnp.sqrt(jnp.sum(w * w))
        return w / jnp.maximum(lam, 1e-30), lam

    _, lam = jax.lax.fori_loop(
        0, iters, body, (v0 / jnp.sqrt(jnp.asarray(float(n), dtype)), 1.0)
    )
    # 5% margin: power iteration approaches rho from below
    return 1.0 / (1.05 * jnp.maximum(lam, 1e-30))


class AffineTwoLevelStructure(NamedTuple):
    """Host-built tables for the affine-coarse two-level preconditioner.

    Coarse space: per contiguous aggregate of ``g`` fine DOFs, the m = 1+d
    vectors [1, x - x_bar, y - y_bar, (z - z_bar)], orthonormalized per
    aggregate (batched QR). With g four times the constants-space
    aggregate, the dense coarse level keeps the same size (na*m unknowns)
    while capturing per-aggregate gradients — the modes the piecewise-
    constant space leaves to the smoother. All transfers remain
    reshape+einsum (zero gathers per iteration).
    """

    W: jnp.ndarray  # (na, g, m) orthonormal per-aggregate basis
    Wb: jnp.ndarray  # (nb, block, m) the same rows grouped per 8-block
    bins1: jnp.ndarray  # (nb*B,) aggregate-pair segment id per tier-1 block
    bins2: jnp.ndarray  # (nh*B2,) same for spilled tier-2 blocks
    na: int
    g: int
    m: int


class AffineTwoLevel(NamedTuple):
    inv_diag: jnp.ndarray
    coarse_inv: jnp.ndarray  # (na*m, na*m)
    W: jnp.ndarray  # (na, g, m)
    blk_inv: jnp.ndarray | None = None
    inv_agg: jnp.ndarray | None = None  # (ns, gs, gs) aggregate smoother
    gs: int = 0

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        na, g, m = self.W.shape
        r_c = jnp.einsum("agm,ag->am", self.W, r.reshape(na, g)).reshape(-1)
        z_c = _mixed_matvec("ij,j->i", self.coarse_inv, r_c, r.dtype)
        z = jnp.einsum("agm,am->ag", self.W, z_c.reshape(na, m)).reshape(-1)
        if self.inv_agg is not None:
            fine = _mixed_matvec(
                "rij,rj->ri", self.inv_agg, r.reshape(-1, self.gs), r.dtype
            ).reshape(-1)
        else:
            fine = _apply_fine(self.blk_inv, self.inv_diag, r)
        return fine + z


def default_affine_aggregate_size(
    structure, m: int = AFFINE_MAX_VECTORS, max_coarse: int = MAX_COARSE
):
    """Aggregate size for the affine space: na*m <= max_coarse."""
    base = BASE_AGGREGATE_BLOCKS * structure.block
    mult0 = -(-structure.n_pad * m // (max_coarse * base))
    return _bounded_divisor_search(structure.n_pad, base, mult0)


def elasticity_rbm_modes(
    coords: np.ndarray,
    components: np.ndarray,
    include_stretch: bool = False,
) -> np.ndarray:
    """Per-DOF rigid-body-mode columns for vector-valued (elasticity) forms.

    For an interleaved vector basis (``basis.VectorBasis``: DOF of
    (node i, comp c) = i*nc + c), constants-per-aggregate coarse spaces
    force equal corrections on every displacement component; the
    near-nullspace of the elasticity operator is instead the rigid body
    modes — per-component translations plus rotations. Returns the
    (n, k) non-constant mode columns to pass to
    ``build_affine_two_level_structure(modes=...)`` (the builder prepends
    the ones column, so translations span {1} x {indicator columns}):

    * component indicators for c = 1..nc-1 (translations),
    * one rotation column per coordinate pair (a, b):
      ``-x_b`` on component-a DOFs, ``x_a`` on component-b DOFs,
    * with ``include_stretch``: per-component coordinate columns
      (captures linear strain fields — a larger coarse space, use with
      proportionally larger aggregates).

    Args:
      coords: (n, d) coordinates of the (interior) DOFs.
      components: (n,) component index of each DOF (``inner_ids % nc``).
    """
    coords = np.asarray(coords, dtype=np.float64)
    components = np.asarray(components)
    n, d = coords.shape
    nc = int(components.max(initial=0)) + 1
    cols = []
    for c in range(1, nc):
        cols.append((components == c).astype(np.float64))
    for a in range(min(nc, d)):
        for b in range(a + 1, min(nc, d)):
            col = np.zeros(n)
            sel_a = components == a
            sel_b = components == b
            col[sel_a] = -coords[sel_a, b]
            col[sel_b] = coords[sel_b, a]
            cols.append(col)
    if include_stretch:
        for c in range(nc):
            sel = components == c
            for j in range(d):
                col = np.zeros(n)
                col[sel] = coords[sel, j]
                cols.append(col)
    return np.stack(cols, axis=1)


def build_affine_two_level_structure(
    structure, coords, g: int | None = None, modes: np.ndarray | None = None
) -> AffineTwoLevelStructure:
    """Host-side W/QR and aggregate-pair bins (value-independent).

    Args:
      structure: the BSR layout.
      coords: (n_inner, d) coordinates of the interior DOFs in ORIGINAL
        reduced order (same array the spatial ordering was built from).
      modes: optional (n_inner, k) columns replacing the coordinate
        columns — each is centered and scaled per aggregate, the constant
        column is always prepended (e.g. ``elasticity_rbm_modes`` for
        vector problems). None keeps the affine space [1, x, y, (z)].
    """
    coords = np.asarray(coords) if modes is None else np.asarray(modes)
    d = coords.shape[1]
    m = 1 + d
    if g is None:
        g = default_affine_aggregate_size(structure, m=m)
    if g % structure.block or structure.n_pad % g:
        raise ValueError(
            f"affine aggregate size {g} must be a multiple of "
            f"{structure.block} and divide n_pad {structure.n_pad}"
        )
    n_pad = structure.n_pad
    na = n_pad // g

    cp = np.zeros((n_pad, d), dtype=np.float64)
    cp[: structure.n_inner] = coords[structure.perm]
    X = cp.reshape(na, g, d)
    X = X - X.mean(axis=1, keepdims=True)
    span = np.maximum(np.abs(X).max(axis=1, keepdims=True), 1e-12)
    cols = np.concatenate([np.ones((na, g, 1)), X / span], axis=-1)
    # batched reduced QR; rank-deficient aggregates (planar fractures make
    # one coordinate affine in the others) get arbitrary orthonormal tail
    # columns — harmless extra directions in an SPD coarse space
    W, _ = np.linalg.qr(cols)

    block = structure.block
    gb = g // block
    nb, B = structure.bcols.shape
    bcols = np.asarray(structure.bcols)
    rows_c = np.repeat(np.arange(nb) // gb, B)
    bins1 = rows_c * na + (bcols // gb).reshape(-1)
    heavy = np.asarray(structure.heavy_rows)
    bcols2 = np.asarray(structure.bcols2)
    if heavy.size:
        bins2 = (
            np.repeat(heavy // gb, bcols2.shape[1]) * na
            + (bcols2 // gb).reshape(-1)
        )
    else:
        bins2 = np.zeros((0,), dtype=np.int64)

    dt = config.default_dtype()
    i_t = config.index_dtype()
    Wj = jnp.asarray(W, dtype=dt)
    return AffineTwoLevelStructure(
        W=Wj,
        Wb=Wj.reshape(nb, block, m),
        bins1=jnp.asarray(bins1, dtype=i_t),
        bins2=jnp.asarray(bins2, dtype=i_t),
        na=int(na),
        g=int(g),
        m=int(m),
    )


def get_affine_two_level_structure(
    basis,
    structure,
    g: int | None = None,
    rbm: bool = False,
    mode_kind: str | None = None,
) -> AffineTwoLevelStructure:
    """Cached-per-basis affine / rigid-body-mode / component coarse tables.

    ``mode_kind`` selects the per-aggregate column set (``rbm=True`` is a
    shorthand for ``mode_kind="rbm"``):

    * ``"affine"`` (default): [1, x, y, (z)] — scalar problems.
    * ``"rbm"``: constants + per-component translations + rotations
      (``elasticity_rbm_modes``) — coupled vector problems (elasticity).
    * ``"components"``: constants + component indicators only (m =
      n_components). The near-nullspace of a component-DECOUPLED vector
      operator (e.g. the Stokes full-gradient viscous block) is exactly
      per-component constants — dropping the rotation column buys
      smaller aggregates under the same dense-coarse cap (na*m <=
      MAX_COARSE), i.e. a finer coarse space per component. Measured on
      the 107k-DOF Stokes A block this is the difference between the RBM
      path's ~1049 inner iterations and the scalar-grade ~550.
    """
    if mode_kind is None:
        mode_kind = "rbm" if rbm else "affine"
    if mode_kind not in ("affine", "rbm", "components"):
        raise ValueError(f"unknown mode_kind: {mode_kind!r}")
    cache = getattr(basis, "_affine_two_level_structures", None)
    if cache is None:
        cache = {}
        basis._affine_two_level_structures = cache
    key = (structure.nb, structure.bcols.shape[1],
           structure.heavy_rows.shape[0], g, mode_kind)
    ast = cache.get(key)
    if ast is None:
        inner = np.asarray(basis._basis_parameters["inner_dofs"])
        coords = np.asarray(basis._coords4global_dofs)[inner]
        modes = None
        if mode_kind in ("rbm", "components"):
            nc = int(getattr(basis, "n_components", 1))
            if nc < 2:
                raise ValueError(
                    f"{mode_kind} coarse space requires a vector basis "
                    "(n_components >= 2)"
                )
            if mode_kind == "rbm":
                modes = elasticity_rbm_modes(coords, inner % nc)
            else:
                comp = inner % nc
                modes = np.stack(
                    [(comp == c).astype(np.float64) for c in range(1, nc)],
                    axis=1,
                )
        ast = build_affine_two_level_structure(
            structure, coords, g=g, modes=modes
        )
        cache[key] = ast
    return ast


def affine_two_level_from_values(
    ast: AffineTwoLevelStructure,
    structure,
    values,
    diag,
    fine: str = "block_jacobi",
    operand_dtype=None,
    gs: int | None = None,
    agg_table=None,
):
    """Jittable numeric setup of the affine-coarse two-level M.

    Galerkin coarse matrix per aggregate pair:
        A_c[I, J] = sum over blocks (r, b) with r in I, bcols[r,b] in J of
                    Wb[r]^T A[r,b] Wb[bcols[r,b]]
    — two small einsums over the streamed tier values plus one m*m-row
    segment-sum (row-descriptor-charged, ~nb*B descriptors).

    ``fine="agg_block"`` swaps the 8x8 block-Jacobi fine smoother for the
    (gs x gs) aggregate diagonal-block inverses of ``AggBlockTwoLevel`` —
    measured on the P2 vector Laplacian (Stokes A block, 107k DOFs) the
    8x8 smoother converges at only ~0.89/iteration where the scalar
    aggblock path runs ~0.82; the aggregate smoother is purely algebraic,
    so it composes with the RBM coarse space unchanged. ``gs`` defaults to
    min(gs default, 128); ``agg_table`` may be precomputed on the host via
    ``build_agg_block_table``.
    """
    v1, v2 = values
    block = structure.block
    na, m = ast.na, ast.m
    Wb = ast.Wb.astype(v1.dtype)

    Wc = Wb[structure.bcols]  # (nb, B, block, m) row gathers
    t1 = jnp.einsum("rbij,rbjm->rbim", v1, Wc)
    G1 = jnp.einsum("rin,rbim->rbnm", Wb, t1).reshape(-1, m, m)
    coarse = jax.ops.segment_sum(G1, ast.bins1, num_segments=na * na)
    if structure.heavy_rows.shape[0]:
        Wh = Wb[structure.heavy_rows]
        t2 = jnp.einsum("rbij,rbjm->rbim", v2, Wb[structure.bcols2])
        G2 = jnp.einsum("rin,rbim->rbnm", Wh, t2).reshape(-1, m, m)
        coarse = coarse + jax.ops.segment_sum(
            G2, ast.bins2, num_segments=na * na
        )
    Ac = (
        coarse.reshape(na, na, m, m)
        .transpose(0, 2, 1, 3)
        .reshape(na * m, na * m)
    )
    Ac = 0.5 * (Ac + Ac.T)
    shift_scale = jnp.maximum(jnp.trace(Ac) / (na * m), 1.0)
    coarse_inv = spd_inverse(
        Ac + 1e-7 * shift_scale * jnp.eye(na * m, dtype=Ac.dtype)
    )

    safe = jnp.where(diag != 0, diag, 1.0)
    inv_agg = None
    if fine == "agg_block":
        if gs is None:
            gs = min(default_aggregate_size(structure), 128)
        inv_agg = aggregate_block_inverses(
            structure, values, gs, table=agg_table, operand_dtype=operand_dtype
        )
        blk_inv = None
    else:
        blk_inv = _fine_block_smoother(v1, block, fine, operand_dtype)
    if operand_dtype is not None:
        coarse_inv = coarse_inv.astype(operand_dtype)
    return AffineTwoLevel(
        inv_diag=1.0 / safe,
        coarse_inv=coarse_inv,
        W=ast.W.astype(v1.dtype),
        blk_inv=blk_inv,
        inv_agg=inv_agg,
        gs=0 if gs is None else int(gs),
    )


def mult_two_level_from_values(
    structure,
    values,
    diag,
    g: int | None = None,
    omega="auto",
    operand_dtype=None,
    inner_dtype=None,
):
    """Symmetrized multiplicative (V(1,1)) block two-level preconditioner.

    z = S r;  z += P0 A_c^{-1} P0^T (r - A z);  z += S (r - A z)

    with S = omega * blockdiag(A)^{-1} (8x8 block-Jacobi) and the same
    reshape-only aggregate coarse space as ``BlockTwoLevel``. The cycling
    *multiplies* the two error propagators instead of adding the
    corrections: measured 41 vs 82 PCG iterations on the 107k-DOF DFN
    benchmark, for 2 extra SpMVs per apply — and the gap grows with
    problem size (the additive coarse level saturates).

    omega="auto" (default) scales the smoother by 1/rho(S A) estimated
    with a dozen power-iteration SpMVs at setup — REQUIRED for SPD-ness on
    fine meshes (see ``_smoother_scale``); a float skips the estimate.

    The two inner SpMVs only shape the preconditioner, so they may run
    against a reduced-precision copy of the operator: ``inner_dtype=
    jnp.bfloat16`` stores one (halving those SpMVs' streamed bytes); the
    PCG matvec itself stays exact. ``operand_dtype`` reduces the dense
    apply operands as in ``block_two_level_from_values``.

    Returns a closure (not a pytree); build it inside the jitted program
    like the other ``*_from_values`` setups.
    """
    from .bsr import bsr_matvec

    base = block_two_level_from_values(
        structure, values, diag, g=g, operand_dtype=operand_dtype
    )
    blk_inv0 = base.blk_inv
    inner_values = values
    if inner_dtype is not None:
        inner_values = tuple(v.astype(inner_dtype) for v in values)

    def smooth0(r):
        return _apply_fine(blk_inv0, None, r)

    matvec = lambda v: bsr_matvec(structure, inner_values, v)
    if omega == "auto":
        scale = _smoother_scale(
            smooth0, matvec, structure.n_pad, values[0].dtype
        )
    else:
        scale = jnp.asarray(omega, values[0].dtype)

    def smooth(r):
        return scale.astype(r.dtype) * smooth0(r)

    def apply(r):
        z = smooth(r)
        z = z + base.coarse_apply(r - matvec(z))
        z = z + smooth(r - matvec(z))
        return z

    return apply


def mult_three_level_from_values(
    tl: ThreeLevelStructure,
    structure,
    values,
    diag,
    omega="auto",
    operand_dtype=None,
):
    """Symmetrized multiplicative V(1,1) cycle over the 3-level hierarchy.

    Same sandwich as ``mult_two_level_from_values`` with the coarse
    correction replaced by the sparse-coarse chain (g2-block-Jacobi on A_c
    plus the dense bottom level). Costs 2 extra fine SpMVs per apply;
    wins only if it cuts iterations >2.5x vs the additive 3-level (the
    additive apply is cheap) — measure before defaulting.
    """
    from .bsr import bsr_matvec

    base = three_level_from_values(
        tl, structure, values, diag, operand_dtype=operand_dtype
    )
    blk_inv = base.blk_inv

    def smooth0(r):
        return _apply_fine(blk_inv, None, r)

    matvec0 = lambda v: bsr_matvec(structure, values, v)
    if omega == "auto":
        scale = _smoother_scale(smooth0, matvec0, structure.n_pad, values[0].dtype)
    else:
        scale = jnp.asarray(omega, values[0].dtype)

    def smooth(r):
        return scale.astype(r.dtype) * smooth0(r)

    def apply(r):
        z = smooth(r)
        z = z + base.coarse_apply(r - bsr_matvec(structure, values, z))
        z = z + smooth(r - bsr_matvec(structure, values, z))
        return z

    return apply


def smoothed_two_level_matrix_free(
    structure, values, diag, g: int | None = None, omega: float = 0.67
):
    """Smoothed-aggregation two-level M^{-1} with matrix-free P applies.

    M^{-1} = D^{-1} + P A_c^{-1} P^T with P = (I - omega D^{-1} A) P0 —
    but P is never stored: the prolongator apply is ``repeat`` + one BSR
    SpMV, the restriction a BSR SpMV + ``reshape-sum``. Per CG iteration
    this costs two extra SpMVs and zero scalar gathers, vs the n*kp
    gather-entries of ``SmoothedTwoLevel``. The P applies are exact (no
    per-row kp truncation), and the coarse matrix is the *tentative*
    Galerkin A_c = P0^T A P0 — the same choice as the table-based
    ``two_level_from_values``, but NOT the smoothed Galerkin P^T A P of
    ``build_smoothed_two_level``, so iteration counts differ slightly
    between those two. The additive combination of SPD terms keeps CG
    theory intact. Returns a closure usable as ``pcg(precond=...)``.

    Note: with the BSR SpMV this is usually a net LOSS vs the plain
    ``block_two_level_from_values`` (1 SpMV/iteration) — kept as the
    lowest-iteration-count option for expensive operators.
    """
    from .bsr import bsr_matvec

    if g is None:
        g = default_aggregate_size(structure)
    base = block_two_level_from_values(structure, values, diag, g=g, fine="jacobi")
    inv_diag, coarse_inv = base.inv_diag, base.coarse_inv
    n_pad = structure.n_pad

    def apply(r):
        # P^T r = P0^T (I - omega A D^{-1}) r
        rs = r - omega * bsr_matvec(structure, values, inv_diag * r)
        r_c = rs.reshape(-1, g).sum(axis=-1)
        z_c = coarse_inv @ r_c
        # P z_c = (I - omega D^{-1} A) (P0 z_c)
        z0 = _prolong(z_c, g, n_pad)
        z = z0 - omega * inv_diag * bsr_matvec(structure, values, z0)
        return inv_diag * r + z

    return apply


class SmoothedTwoLevel(NamedTuple):
    """M^{-1} = D^{-1} + P A_c^{-1} P^T with a smoothed-aggregation P.

    P = (I - omega D^{-1} A) P0, P0 piecewise-constant over spatial
    aggregates. All applies are gather-only:

      restrict  (P^T r): gather r at P's fine rows per coarse column,
      coarse solve: dense matmul with the precomputed inverse,
      prolong   (P z_c): gather z_c at each fine row's coarse columns.

    Cuts Jacobi-PCG iteration counts ~3-4x on DFN Poisson problems at the
    cost of ~nnz(P) extra gathered elements per iteration.
    """

    inv_diag: jnp.ndarray  # (n,)
    p_cols: jnp.ndarray  # (n, KP) coarse column ids per fine row
    p_vals: jnp.ndarray  # (n, KP) weights (0 on padding)
    pt_rows: jnp.ndarray  # (nc, DP) fine row ids per coarse column (pad -> n)
    pt_vals: jnp.ndarray  # (nc, DP) weights (0 on padding)
    coarse_inv: jnp.ndarray  # (nc, nc)

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        r_pad = jnp.concatenate([r, jnp.zeros((1,), dtype=r.dtype)])
        r_c = (self.pt_vals * r_pad[self.pt_rows]).sum(axis=-1)
        z_c = self.coarse_inv @ r_c
        z_fine = (self.p_vals * z_c[self.p_cols]).sum(axis=-1)
        return self.inv_diag * r + z_fine


def build_smoothed_two_level(
    structure: ELLStructure,
    values,
    coords: np.ndarray,
    leaf: int = 32,
    omega: float = 0.67,
    max_row_nnz: int = 4,
) -> SmoothedTwoLevel:
    """Host setup (scipy) + device tables for the smoothed two-level M.

    Args:
      structure/values: assembled hybrid-ELL operator (reduced system).
      coords: (n_inner, d) coordinates of the reduced DOFs (for clustering).
      leaf: target aggregate size.
      omega: damping of the prolongator smoothing step.
      max_row_nnz: cap on P's per-row entries (keep largest |weight|) — the
        prolong gather cost is n * max_row_nnz elements per iteration, and a
        truncated P remains a valid SPD preconditioner.
    """
    import scipy.sparse as sp

    n = structure.n_inner
    ell, spill = values
    ell_np = np.asarray(ell) * np.asarray(structure.pad_mask)
    cols_np = np.asarray(structure.cols)
    rows_np = np.repeat(np.arange(n), cols_np.shape[1])
    A = sp.csr_matrix(
        (ell_np.reshape(-1), (rows_np, cols_np.reshape(-1))), shape=(n, n)
    )
    if structure.spill_rows.shape[0]:
        A = A + sp.csr_matrix(
            (
                np.asarray(spill),
                (np.asarray(structure.spill_rows), np.asarray(structure.spill_cols)),
            ),
            shape=(n, n),
        )

    D = np.where(A.diagonal() != 0, A.diagonal(), 1.0)
    agg = spatial_aggregates(coords, leaf)
    nc = int(agg.max()) + 1
    P0 = sp.csr_matrix(
        (np.ones(n), (np.arange(n), agg)), shape=(n, nc)
    )
    P = ((sp.identity(n, format="csr") - omega * sp.diags(1.0 / D) @ A) @ P0).tocsr()

    # truncate each row of P to its largest-|weight| entries
    if max_row_nnz is not None:
        indptr, indices, data = P.indptr, P.indices, P.data
        keep_mask = np.ones(P.nnz, dtype=bool)
        counts = np.diff(indptr)
        for row in np.nonzero(counts > max_row_nnz)[0]:
            s, e = indptr[row], indptr[row + 1]
            drop = np.argsort(np.abs(data[s:e]))[: (e - s) - max_row_nnz]
            keep_mask[s + drop] = False
        row_of_nnz = np.repeat(np.arange(n), counts)
        new_counts = np.bincount(row_of_nnz[keep_mask], minlength=n)
        P = sp.csr_matrix(
            (
                data[keep_mask],
                indices[keep_mask],
                np.concatenate([[0], np.cumsum(new_counts)]),
            ),
            shape=(n, nc),
        )

    Ac = (P.T @ A @ P).toarray()
    Ac = 0.5 * (Ac + Ac.T)
    shift = 1e-8 * np.trace(Ac) / nc
    Ac_inv = np.linalg.inv(Ac + shift * np.eye(nc))

    # prolong table: per fine row, its coarse columns + weights
    coo = P.tocoo()
    kp = int(np.bincount(coo.row, minlength=n).max())
    p_cols = np.zeros((n, kp), dtype=np.int64)
    p_vals = np.zeros((n, kp), dtype=np.float64)
    order = np.argsort(coo.row, kind="stable")
    starts = np.concatenate([[0], np.cumsum(np.bincount(coo.row, minlength=n))])
    pos = np.arange(coo.nnz) - starts[coo.row[order]]
    p_cols[coo.row[order], pos] = coo.col[order]
    p_vals[coo.row[order], pos] = coo.data[order]

    # restrict table: per coarse column, its fine rows + weights
    dp = int(np.bincount(coo.col, minlength=nc).max())
    pt_rows = np.full((nc, dp), n, dtype=np.int64)
    pt_vals = np.zeros((nc, dp), dtype=np.float64)
    order_c = np.argsort(coo.col, kind="stable")
    starts_c = np.concatenate([[0], np.cumsum(np.bincount(coo.col, minlength=nc))])
    pos_c = np.arange(coo.nnz) - starts_c[coo.col[order_c]]
    pt_rows[coo.col[order_c], pos_c] = coo.row[order_c]
    pt_vals[coo.col[order_c], pos_c] = coo.data[order_c]

    from .. import config

    f = config.default_dtype()
    i = config.index_dtype()
    return SmoothedTwoLevel(
        inv_diag=jnp.asarray(1.0 / np.where(D != 0, D, 1.0), dtype=f),
        p_cols=jnp.asarray(p_cols, dtype=i),
        p_vals=jnp.asarray(p_vals, dtype=f),
        pt_rows=jnp.asarray(pt_rows, dtype=i),
        pt_vals=jnp.asarray(pt_vals, dtype=f),
        coarse_inv=jnp.asarray(Ac_inv, dtype=f),
    )


class TwoLevelStructure(NamedTuple):
    """Static (host-built, value-independent) tables for the device setup.

    Splits the smoothed-two-level construction the same way assembly is
    split: geometry/topology on the host once, per-assembly numeric work as
    one small jitted program (``two_level_from_values``) — no host round
    trip of matrix values, no scipy in the timed path.
    """

    slot_pslot: jnp.ndarray  # (n, K): P-slot of each ELL slot (KP = dropped)
    p_cols: jnp.ndarray  # (n, KP) coarse (aggregate) column ids
    p_mask: jnp.ndarray  # (n, KP) 1.0 where a real P entry lives
    is_self: jnp.ndarray  # (n, KP) 1.0 where the entry is the own aggregate
    pt_rows: jnp.ndarray  # (nc, DP) fine rows per coarse column (pad -> n)
    pt_gather: jnp.ndarray  # (nc, DP) flat (i*KP+p) P-entry ids (pad -> n*KP)
    ac_bins: jnp.ndarray  # (n*K,) coarse bin of each ELL slot
    ac_spill_bins: jnp.ndarray  # (S,)
    nc: int
    kp: int


def build_two_level_structure(
    structure: ELLStructure, coords: np.ndarray, leaf: int = 32, kp: int = 4
) -> TwoLevelStructure:
    """Host-side once-per-basis construction of the two-level tables."""
    from .. import config

    n = structure.n_inner
    K = structure.cols.shape[1]
    agg = spatial_aggregates(coords, leaf)
    nc = int(agg.max()) + 1

    cols = np.asarray(structure.cols)
    pad_mask = np.asarray(structure.pad_mask) > 0
    acols = agg[cols]  # (n, K) aggregate of each neighbor
    rows_agg = agg[np.arange(n)]

    # vectorized per-row distinct-aggregate enumeration: own aggregate
    # first, then in first-occurrence order, capped at kp (a first-occurrence
    # policy instead of count-ranking — rows rarely touch > kp aggregates)
    SENTINEL = nc + 1
    acols_m = np.where(pad_mask, acols, SENTINEL)  # (n, K)
    ext = np.concatenate([rows_agg[:, None], acols_m], axis=1)  # (n, K+1)

    # first-occurrence flag per position: not equal to any earlier position
    eq = ext[:, :, None] == ext[:, None, :]  # (n, K+1, K+1)
    earlier = np.tril(np.ones((K + 1, K + 1), dtype=bool), k=-1)
    seen_before = (eq & earlier[None]).any(axis=2)
    is_first = (~seen_before) & (ext != SENTINEL)

    # p-index of each first occurrence (own aggregate at position 0 -> p=0)
    p_of_pos = np.cumsum(is_first, axis=1) - 1  # valid where is_first
    p_of_pos = np.where(is_first, p_of_pos, kp)

    # for every position, the p of its value = p at its first occurrence
    first_pos = np.argmax(eq & is_first[:, None, :], axis=2)  # (n, K+1)
    p_all = np.take_along_axis(p_of_pos, first_pos, axis=1)
    p_all = np.where(ext == SENTINEL, kp, np.minimum(p_all, kp))

    slot_pslot = np.where(p_all[:, 1:] < kp, p_all[:, 1:], kp)

    p_cols = np.zeros((n, kp), dtype=np.int64)
    p_mask = np.zeros((n, kp), dtype=np.float64)
    rows_idx = np.repeat(np.arange(n), K + 1).reshape(n, K + 1)
    sel = is_first & (p_of_pos < kp)
    p_cols[rows_idx[sel], p_of_pos[sel]] = ext[sel]
    p_mask[rows_idx[sel], p_of_pos[sel]] = 1.0
    is_self = np.zeros((n, kp), dtype=np.float64)
    is_self[:, 0] = 1.0  # own aggregate always occupies slot 0

    # restrict tables: invert the (i, p) -> coarse column map
    flat_cols = p_cols.reshape(-1)
    flat_live = np.nonzero(p_mask.reshape(-1) > 0)[0]
    table = invert_scatter_map(
        flat_cols[flat_live], nc, flat_live, pad=n * kp
    )
    pt_gather = table
    pt_rows = np.where(table < n * kp, table // kp, n)

    rows = np.repeat(np.arange(n), K)
    ac_bins = rows_agg[rows].astype(np.int64) * nc + agg[cols.reshape(-1)]
    if structure.spill_rows.shape[0]:
        ac_spill_bins = (
            agg[np.asarray(structure.spill_rows)] * nc
            + agg[np.asarray(structure.spill_cols)]
        )
    else:
        ac_spill_bins = np.zeros((0,), dtype=np.int64)

    i_t = config.index_dtype()
    f_t = config.default_dtype()
    # bin ids reach nc^2 - 1 and would wrap int32 for nc > 46340
    bin_t = np.int64 if nc * nc > np.iinfo(np.int32).max else i_t
    return TwoLevelStructure(
        slot_pslot=jnp.asarray(slot_pslot, dtype=i_t),
        p_cols=jnp.asarray(p_cols, dtype=i_t),
        p_mask=jnp.asarray(p_mask, dtype=f_t),
        is_self=jnp.asarray(is_self, dtype=f_t),
        pt_rows=jnp.asarray(pt_rows, dtype=i_t),
        pt_gather=jnp.asarray(pt_gather, dtype=i_t),
        ac_bins=jnp.asarray(ac_bins, dtype=bin_t),
        ac_spill_bins=jnp.asarray(ac_spill_bins, dtype=bin_t),
        nc=nc,
        kp=kp,
    )


def two_level_from_values(
    tl: TwoLevelStructure,
    structure: ELLStructure,
    values,
    diag,
    omega: float = 0.67,
) -> SmoothedTwoLevel:
    """Jittable per-assembly numeric setup of the two-level preconditioner.

    P = (I - omega D^{-1} A) P0 evaluated per row from the ELL values (spill
    entries approximated away — truncation-level error only); coarse matrix
    A_c = P0^T A P0 via one scatter into nc^2 bins; dense inverse on device.
    """
    ell, spill = values
    n = structure.n_inner
    K = structure.cols.shape[1]
    kp = tl.kp
    nc = tl.nc

    safe = jnp.where(diag != 0, diag, 1.0)
    inv_diag = 1.0 / safe

    masked = ell * structure.pad_mask
    # contrib[i, p] = sum of row i's A-entries landing in P-slot p
    contrib = jnp.stack(
        [
            jnp.where(tl.slot_pslot == p, masked, 0.0).sum(axis=-1)
            for p in range(kp)
        ],
        axis=-1,
    )  # (n, kp)
    p_vals = (tl.is_self - omega * inv_diag[:, None] * contrib) * tl.p_mask

    # restrict values: gather of the prolong values (static inverse map)
    p_flat = jnp.concatenate(
        [p_vals.reshape(-1), jnp.zeros((1,), dtype=p_vals.dtype)]
    )
    pt_vals = p_flat[tl.pt_gather]

    coarse = jax.ops.segment_sum(
        masked.reshape(-1), tl.ac_bins, num_segments=nc * nc
    )
    if structure.spill_rows.shape[0]:
        coarse = coarse + jax.ops.segment_sum(
            spill, tl.ac_spill_bins, num_segments=nc * nc
        )
    coarse = coarse.reshape(nc, nc)
    coarse = 0.5 * (coarse + coarse.T)
    shift = 1e-7 * jnp.trace(coarse) / nc
    coarse_inv = spd_inverse(
        coarse + shift * jnp.eye(nc, dtype=coarse.dtype)
    )

    return SmoothedTwoLevel(
        inv_diag=inv_diag,
        p_cols=tl.p_cols,
        p_vals=p_vals,
        pt_rows=tl.pt_rows,
        pt_vals=pt_vals,
        coarse_inv=coarse_inv,
    )


def build_two_level(
    structure: ELLStructure, values, diag, block: int = 128
) -> TwoLevelPreconditioner:
    """Build the two-level preconditioner from an assembled ELL operator.

    ``A_c[a, b] = sum of entries with row in aggregate a, col in aggregate
    b`` — computed with one scatter-add over the ELL slots (setup-time only).
    """
    n = structure.n_inner
    K = structure.cols.shape[1]
    nb = -(-n // block)
    n_pad = nb * block

    ell, spill = values
    rows = jnp.repeat(
        jnp.arange(n, dtype=structure.cols.dtype)[:, None], K, axis=1
    )
    row_agg = rows // block
    col_agg = structure.cols // block
    bins = (row_agg * nb + col_agg).reshape(-1)
    vals = (ell * structure.pad_mask).reshape(-1)
    coarse = jax.ops.segment_sum(vals, bins, num_segments=nb * nb).reshape(nb, nb)
    if structure.spill_rows.shape[0]:
        spill_bins = (structure.spill_rows // block) * nb + (
            structure.spill_cols // block
        )
        coarse = coarse + jax.ops.segment_sum(
            spill, spill_bins, num_segments=nb * nb
        ).reshape(nb, nb)

    # symmetrize against f32 roundoff before inverting
    coarse = 0.5 * (coarse + coarse.T)
    # aggregates of pure-Neumann pieces could be singular in principle;
    # a tiny diagonal shift keeps the inverse stable without affecting
    # preconditioning quality
    shift = 1e-8 * jnp.trace(coarse) / nb
    coarse_inv = spd_inverse(coarse + shift * jnp.eye(nb, dtype=coarse.dtype))

    safe = jnp.where(diag != 0, diag, 1.0)
    return TwoLevelPreconditioner(
        inv_diag=1.0 / safe,
        coarse_inv=coarse_inv,
        block=block,
        n=n,
        n_pad=n_pad,
    )
