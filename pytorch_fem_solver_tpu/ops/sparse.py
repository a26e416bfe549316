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
    """Static (host-built) ELL layout for a reduced FEM operator."""

    cols: jnp.ndarray  # (n_inner, K) reduced column ids (padding -> row 0)
    pad_mask: jnp.ndarray  # (n_inner, K) 1.0 where a real entry lives
    slots: jnp.ndarray  # (n_keep,) target slot (row * K + k) per kept entry
    keep: jnp.ndarray  # (n_keep,) indices into the flat element entries
    gather: jnp.ndarray  # (n_inner * K, D) flat-entry ids per slot (pad = n_entries)
    n_inner: int
    n_entries: int  # total flat element-entry count (T * n_loc^2)


def invert_scatter_map(target_ids, n_targets: int, source_positions, pad: int):
    """Turn a scatter (entry -> target) into a gather table (target -> entries).

    Returns (n_targets, D) of source positions, padded with ``pad``. This is
    the TPU-native assembly transform: a scatter-add with duplicate indices
    (slow, serialized on TPU) becomes a gather + small-axis reduce.
    """
    target_ids = np.asarray(target_ids)
    source_positions = np.asarray(source_positions)
    order = np.argsort(target_ids, kind="stable")
    sorted_t = target_ids[order]
    counts = np.bincount(sorted_t, minlength=n_targets)
    D = max(1, int(counts.max(initial=0)))
    table = np.full((n_targets, D), pad, dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    pos = np.arange(sorted_t.size) - starts[sorted_t]
    table[sorted_t, pos] = source_positions[order]
    return table


def build_ell_structure(dofs, n_dofs: int, inner) -> ELLStructure:
    """Host-side construction of the reduced ELL layout.

    Args:
      dofs: (T, n_loc) global DOF ids per cell (device or host array).
      n_dofs: total global DOF count.
      inner: (n_inner,) interior DOF ids (Dirichlet rows/cols eliminated).
    """
    dofs = np.asarray(dofs).reshape(-1, np.asarray(dofs).shape[-1])
    inner = np.asarray(inner)
    n_loc = dofs.shape[1]

    reduced_id = np.full(n_dofs, -1, dtype=np.int64)
    reduced_id[inner] = np.arange(inner.size)

    rows = reduced_id[np.repeat(dofs, n_loc, axis=1).reshape(-1)]
    cols = reduced_id[np.tile(dofs, (1, n_loc)).reshape(-1)]
    keep = np.nonzero((rows >= 0) & (cols >= 0))[0]
    rows_k = rows[keep]
    cols_k = cols[keep]

    # unique (row, col) pairs -> one ELL slot each
    pair_key = rows_k * inner.size + cols_k
    uniq_keys, entry_pair = np.unique(pair_key, return_inverse=True)
    uniq_rows = uniq_keys // inner.size
    uniq_cols = uniq_keys % inner.size

    counts = np.bincount(uniq_rows, minlength=inner.size)
    K = int(counts.max()) if counts.size else 1

    # position of each unique pair within its row (keys are sorted, so pairs
    # of one row are consecutive)
    row_starts = np.concatenate([[0], np.cumsum(counts)])
    k_of_pair = np.arange(uniq_keys.size) - row_starts[uniq_rows]

    ell_cols = np.zeros((inner.size, K), dtype=np.int64)
    pad = np.zeros((inner.size, K), dtype=np.float64)
    ell_cols[uniq_rows, k_of_pair] = uniq_cols
    pad[uniq_rows, k_of_pair] = 1.0

    slots = uniq_rows[entry_pair] * K + k_of_pair[entry_pair]

    gather = invert_scatter_map(
        slots, inner.size * K, keep, pad=int(rows.size)
    )

    return ELLStructure(
        cols=jnp.asarray(ell_cols, dtype=config.index_dtype()),
        pad_mask=jnp.asarray(pad, dtype=config.default_dtype()),
        slots=jnp.asarray(slots, dtype=config.index_dtype()),
        keep=jnp.asarray(keep, dtype=config.index_dtype()),
        gather=jnp.asarray(gather, dtype=config.index_dtype()),
        n_inner=int(inner.size),
        n_entries=int(rows.size),
    )


def ell_values_from_local(structure: ELLStructure, local_matrices) -> jnp.ndarray:
    """Assemble element matrices into the fixed ELL slots — gather-only.

    ``gather`` inverts the entry->slot scatter on the host, so on device
    assembly is one padded gather + a tiny-axis reduce (no scatter at all).
    """
    flat = local_matrices.reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((1,), dtype=flat.dtype)])
    K = structure.cols.shape[1]
    out = flat[structure.gather].sum(axis=-1)
    return out.reshape(structure.n_inner, K)


def ell_matvec(structure: ELLStructure, values, x):
    """y = A_reduced @ x via gather + multiply-reduce (no scatter)."""
    return (values * x[structure.cols]).sum(axis=-1)


def ell_diagonal(structure: ELLStructure, values):
    """Diagonal of the reduced operator (for Jacobi preconditioning)."""
    row_ids = jnp.arange(structure.n_inner, dtype=structure.cols.dtype)[:, None]
    on_diag = (structure.cols == row_ids) & (structure.pad_mask > 0)
    return jnp.where(on_diag, values, 0.0).sum(axis=-1)


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


def reduced_ell_operator(basis, local_matrices):
    """ELL (matvec, diagonal) for a basis's reduced bilinear operator.

    Drop-in alternative to ``ops.operators.reduced_operator_from_local`` with
    a scatter-free matvec; structure is cached on the basis.
    """
    structure = getattr(basis, "_ell_structure", None)
    if structure is None:
        structure = build_ell_structure(
            basis._global_dofs4elements,
            basis.n_dofs,
            np.asarray(basis._basis_parameters["inner_dofs"]),
        )
        basis._ell_structure = structure
    values = ell_values_from_local(structure, local_matrices)

    def matvec(x):
        return ell_matvec(structure, values, x)

    return matvec, ell_diagonal(structure, values)
