"""Matrix-free FEM operators: gather -> local matvec -> segment-sum.

This replaces the reference's dense ``torch.zeros(n, n)`` + ``index_put_`` +
``torch.linalg.solve`` pipeline (abstract_basis.py:74-93,177-195) with the
TPU-native formulation: the global stiffness action A @ x is computed from
unassembled element matrices as

    x_loc = x[dofs]                      # gather            (T, n_loc)
    y_loc = local_matrices @ x_loc       # batched tiny matmul (T, n_loc)
    y     = segment_sum(y_loc, dofs, n)  # scatter-add

Memory is O(T * n_loc^2) instead of O(n^2), every step is an XLA-fusible
primitive, and the cell axis shards cleanly over a device mesh (see
``parallel.sharding``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def local_matvec(local_matrices, dofs, n_dofs: int, x):
    """Action of the assembled operator on a full DOF vector x (n,)."""
    x_loc = x[dofs]  # (T, n_loc)
    y_loc = jnp.einsum("...tij,...tj->...ti", local_matrices, x_loc)
    return jax.ops.segment_sum(
        y_loc.reshape(-1), dofs.reshape(-1), num_segments=n_dofs
    )


def operator_diagonal(local_matrices, dofs, n_dofs: int):
    """Diagonal of the assembled operator (Jacobi preconditioner)."""
    diag_loc = jnp.diagonal(local_matrices, axis1=-2, axis2=-1)
    return jax.ops.segment_sum(
        diag_loc.reshape(-1), dofs.reshape(-1), num_segments=n_dofs
    )


def reduced_operator_from_local(
    basis, local_matrices
) -> Tuple[Callable[[jnp.ndarray], jnp.ndarray], jnp.ndarray]:
    """Matrix-free operator restricted to interior DOFs.

    Dirichlet elimination without slicing a matrix: the reduced vector is
    scattered into a full vector (zeros on boundary DOFs), the full operator
    applied, and the interior entries gathered back. Returns
    ``(matvec, jacobi_diagonal)`` where ``matvec`` maps (n_inner,) ->
    (n_inner,).
    """
    n_loc = basis._global_dofs4elements.shape[-1]
    # flatten any leading batch axes (fracture bases carry (B*T, n_loc) DOF
    # maps against (B, T, n_loc, n_loc) local matrices)
    dofs = basis._global_dofs4elements.reshape(-1, n_loc)
    local_matrices = local_matrices.reshape(-1, n_loc, n_loc)
    n = basis.n_dofs
    inner = basis._basis_parameters["inner_dofs"]

    def matvec(x_reduced):
        x_full = jnp.zeros((n,), dtype=x_reduced.dtype).at[inner].set(x_reduced)
        return local_matvec(local_matrices, dofs, n, x_full)[inner]

    diag = operator_diagonal(local_matrices, dofs, n)[inner]
    return matvec, diag
