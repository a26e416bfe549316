"""ELL sparse operators: scatter-free SpMV for the PCG hot loop.

TPU scatters (segment_sum with arbitrary duplicate indices) serialize badly;
gathers vectorize well. For repeated matvecs (every PCG iteration) the
winning layout is ELLPACK on the *reduced* (interior-DOF) system:

    y[i] = sum_k vals[i, k] * x[cols[i, k]]        k < K (max row degree ~ 8)

which is one gather + one VPU multiply-reduce, no scatter at all. The slot
map from unassembled element-matrix entries to (row, k) positions is computed
once on the host; re-assembling values after a coefficient change is a single
device scatter into the fixed slots. P1 triangle meshes have K ~ 8, so the
padded storage is ~n*8 floats — far below BCOO+sort approaches and ideal for
XLA's static shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config


class ELLStructure(NamedTuple):
    """Static (host-built) ELL layout for a reduced FEM operator.

    Optionally *hybrid*: rows with degree > K spill their excess entries
    into a COO tail (``spill_*``). On gather-cost-dominated TPUs this trims
    the gathered element count by ~1/3 (mean P1 degree ~7 vs max ~15; the
    heavy rows are fracture-trace DOFs).
    """

    cols: jnp.ndarray  # (n_inner, K) reduced column ids (padding -> row 0)
    pad_mask: jnp.ndarray  # (n_inner, K) 1.0 where a real entry lives
    slots: np.ndarray  # host-side: target slot (row * K + k) per kept entry
    keep: np.ndarray  # host-side: indices into the flat element entries
    gather: jnp.ndarray  # (n_slots, D) flat-entry ids per slot (pad = n_entries)
    spill_rows: jnp.ndarray  # (S,) reduced row ids of spilled pairs
    spill_cols: jnp.ndarray  # (S,) reduced col ids of spilled pairs
    spill_gather: jnp.ndarray  # (S, D2) flat-entry ids per spilled pair
    n_inner: int
    n_entries: int  # total flat element-entry count (T * n_loc^2)


def invert_scatter_map(target_ids, n_targets: int, source_positions, pad: int):
    """Turn a scatter (entry -> target) into a gather table (target -> entries).

    Returns (n_targets, D) of source positions, padded with ``pad``. This is
    the TPU-native assembly transform: a scatter-add with duplicate indices
    (slow, serialized on TPU) becomes a gather + small-axis reduce.
    """
    from ..native import radix_argsort as native_radix_argsort

    target_ids = np.asarray(target_ids)
    source_positions = np.asarray(source_positions)
    order = native_radix_argsort(target_ids)
    if order is None:
        order = np.argsort(target_ids, kind="stable")
    sorted_t = target_ids[order]
    counts = np.bincount(sorted_t, minlength=n_targets)
    D = max(1, int(counts.max(initial=0)))
    table = np.full((n_targets, D), pad, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(sorted_t.size) - starts[sorted_t]
    table[sorted_t, pos] = source_positions[order]
    return table


def build_ell_structure(
    dofs, n_dofs: int, inner, max_k: int | None = None
) -> ELLStructure:
    """Host-side construction of the reduced (hybrid) ELL layout.

    Args:
      dofs: (T, n_loc) global DOF ids per cell (device or host array).
      n_dofs: total global DOF count.
      inner: (n_inner,) interior DOF ids (Dirichlet rows/cols eliminated).
      max_k: cap on entries-per-row in the ELL part; rows with more entries
        spill the excess into the COO tail. None = no spill (pure ELL).
    """
    dofs = np.asarray(dofs).reshape(-1, np.asarray(dofs).shape[-1])
    inner = np.asarray(inner)
    n_loc = dofs.shape[1]

    reduced_id = np.full(n_dofs, -1, dtype=np.int64)
    reduced_id[inner] = np.arange(inner.size)

    rows = reduced_id[np.repeat(dofs, n_loc, axis=1).reshape(-1)]
    cols = reduced_id[np.tile(dofs, (1, n_loc)).reshape(-1)]
    keep_all = np.nonzero((rows >= 0) & (cols >= 0))[0]
    rows_k = rows[keep_all]
    cols_k = cols[keep_all]

    # unique (row, col) pairs -> one slot each
    pair_key = rows_k * inner.size + cols_k
    uniq_keys, entry_pair = np.unique(pair_key, return_inverse=True)
    uniq_rows = uniq_keys // inner.size
    uniq_cols = uniq_keys % inner.size

    counts = np.bincount(uniq_rows, minlength=inner.size)
    K_full = int(counts.max()) if counts.size else 1
    K = K_full if max_k is None else min(K_full, int(max_k))

    # position of each unique pair within its row (keys sorted -> pairs of
    # one row are consecutive); keep the diagonal first so it never spills
    row_starts = np.concatenate([[0], np.cumsum(counts)])
    k_of_pair = np.arange(uniq_keys.size) - row_starts[uniq_rows]
    # swap each row's diagonal pair into position 0 (so it never spills and
    # the Jacobi diagonal always lives in the ELL part)
    diag_mask = uniq_rows == uniq_cols
    diag_pos = np.zeros(inner.size, dtype=np.int64)
    diag_pos[uniq_rows[diag_mask]] = k_of_pair[diag_mask]
    k_of_pair = np.where(
        diag_mask,
        0,
        np.where(k_of_pair == 0, diag_pos[uniq_rows], k_of_pair),
    )

    in_ell = k_of_pair < K
    ell_pairs = np.nonzero(in_ell)[0]
    spill_pairs = np.nonzero(~in_ell)[0]

    ell_cols = np.zeros((inner.size, K), dtype=np.int64)
    pad = np.zeros((inner.size, K), dtype=np.float64)
    ell_cols[uniq_rows[ell_pairs], k_of_pair[ell_pairs]] = uniq_cols[ell_pairs]
    pad[uniq_rows[ell_pairs], k_of_pair[ell_pairs]] = 1.0

    # slot id per unique pair: ELL pairs -> row*K + k; spilled pairs ->
    # n_inner*K + spill_index
    pair_slot = np.full(uniq_keys.size, -1, dtype=np.int64)
    pair_slot[ell_pairs] = uniq_rows[ell_pairs] * K + k_of_pair[ell_pairs]
    pair_slot[spill_pairs] = inner.size * K + np.arange(spill_pairs.size)

    slots = pair_slot[entry_pair]
    n_slots = inner.size * K + spill_pairs.size

    gather_full = invert_scatter_map(slots, n_slots, keep_all, pad=int(rows.size))
    gather = gather_full[: inner.size * K]
    spill_gather = gather_full[inner.size * K :]

    return ELLStructure(
        cols=jnp.asarray(ell_cols, dtype=config.index_dtype()),
        pad_mask=jnp.asarray(pad, dtype=config.default_dtype()),
        slots=np.asarray(slots, dtype=np.int64),
        keep=np.asarray(keep_all, dtype=np.int64),
        gather=jnp.asarray(gather, dtype=config.index_dtype()),
        spill_rows=jnp.asarray(uniq_rows[spill_pairs], dtype=config.index_dtype()),
        spill_cols=jnp.asarray(uniq_cols[spill_pairs], dtype=config.index_dtype()),
        spill_gather=jnp.asarray(spill_gather, dtype=config.index_dtype()),
        n_inner=int(inner.size),
        n_entries=int(rows.size),
    )


def ell_values_from_local(structure: ELLStructure, local_matrices):
    """Assemble element matrices into the fixed slots — gather-only.

    ``gather`` inverts the entry->slot scatter on the host, so on device
    assembly is one padded gather + a tiny-axis reduce (no scatter at all).
    Returns ``(ell_values (n_inner, K), spill_values (S,))``.
    """
    flat = local_matrices.reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((1,), dtype=flat.dtype)])
    K = structure.cols.shape[1]
    ell = flat[structure.gather].sum(axis=-1).reshape(structure.n_inner, K)
    if structure.spill_rows.shape[0]:
        spill = flat[structure.spill_gather].sum(axis=-1)
    else:
        spill = jnp.zeros((0,), dtype=flat.dtype)
    return ell, spill


def ell_matvec(structure: ELLStructure, values, x):
    """y = A_reduced @ x via gather + multiply-reduce (+ tiny COO tail)."""
    ell, spill = values
    y = (ell * x[structure.cols]).sum(axis=-1)
    if structure.spill_rows.shape[0]:
        # spill pairs are emitted in row-major key order -> sorted segments
        y = y + jax.ops.segment_sum(
            spill * x[structure.spill_cols],
            structure.spill_rows,
            num_segments=structure.n_inner,
            indices_are_sorted=True,
        )
    return y


def ell_diagonal(structure: ELLStructure, values):
    """Diagonal of the reduced operator (always in the ELL part, slot 0)."""
    ell, _ = values
    row_ids = jnp.arange(structure.n_inner, dtype=structure.cols.dtype)[:, None]
    on_diag = (structure.cols == row_ids) & (structure.pad_mask > 0)
    return jnp.where(on_diag, ell, 0.0).sum(axis=-1)


class LoadStructure(NamedTuple):
    """Gather table for scatter-free load-vector assembly."""

    gather: jnp.ndarray  # (n_dofs, D) flat entry ids, pad = n_entries
    n_entries: int


def build_load_structure(dofs, n_dofs: int) -> LoadStructure:
    """Host-built inverse of the linear-form scatter (dof -> entries)."""
    flat_dofs = np.asarray(dofs).reshape(-1)
    table = invert_scatter_map(
        flat_dofs, n_dofs, np.arange(flat_dofs.size), pad=int(flat_dofs.size)
    )
    return LoadStructure(
        gather=jnp.asarray(table, dtype=config.index_dtype()),
        n_entries=int(flat_dofs.size),
    )


def load_from_local(structure: LoadStructure, local_vectors) -> jnp.ndarray:
    """Assemble element load vectors (..., T, n_loc, 1) -> (n_dofs, 1)."""
    flat = local_vectors.reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((1,), dtype=flat.dtype)])
    return flat[structure.gather].sum(axis=-1)[:, None]


def get_ell_structure(basis, max_k: int | None = None) -> ELLStructure:
    """Cached-per-basis ELL layout, keyed by ``max_k``.

    The single cache point for every consumer (``solve_iterative``,
    ``reduced_ell_operator``, the sharded solvers) — a plain attribute cache
    would silently hand back a layout built for a different ``max_k``.
    """
    cache = getattr(basis, "_ell_structures", None)
    if cache is None:
        cache = {}
        basis._ell_structures = cache
    structure = cache.get(max_k)
    if structure is None:
        structure = build_ell_structure(
            basis._global_dofs4elements,
            basis.n_dofs,
            np.asarray(basis._basis_parameters["inner_dofs"]),
            max_k=max_k,
        )
        cache[max_k] = structure
    return structure


def reduced_ell_operator(basis, local_matrices):
    """ELL (matvec, diagonal) for a basis's reduced bilinear operator.

    Drop-in alternative to ``ops.operators.reduced_operator_from_local`` with
    a scatter-free matvec; structure is cached on the basis.
    """
    structure = get_ell_structure(basis)
    values = ell_values_from_local(structure, local_matrices)

    def matvec(x):
        return ell_matvec(structure, values, x)

    return matvec, ell_diagonal(structure, values)
