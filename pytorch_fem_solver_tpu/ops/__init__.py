"""Compute ops: matrix-free operators, sparse formats, solvers, kernels."""

from .bsr import (
    build_bsr_structure,
    bsr_diagonal,
    bsr_expand,
    bsr_matvec,
    bsr_reduce,
    bsr_values_from_local,
    get_bsr_structure,
)
from .operators import local_matvec, operator_diagonal, reduced_operator_from_local
from .precondition import (
    batched_small_inv,
    block_two_level_from_values,
    default_aggregate_size,
    build_smoothed_two_level,
    smoothed_two_level_matrix_free,
    build_two_level,
    build_two_level_structure,
    spatial_aggregates,
    two_level_from_values,
)
from .solvers import cg, dense_solve, pcg
from .sparse import (
    build_ell_structure,
    ell_diagonal,
    ell_matvec,
    ell_values_from_local,
    get_ell_structure,
    invert_scatter_map,
    reduced_ell_operator,
)

__all__ = [
    "local_matvec",
    "operator_diagonal",
    "reduced_operator_from_local",
    "cg",
    "dense_solve",
    "pcg",
    "build_ell_structure",
    "ell_diagonal",
    "ell_matvec",
    "ell_values_from_local",
    "get_ell_structure",
    "invert_scatter_map",
    "reduced_ell_operator",
    "build_smoothed_two_level",
    "build_two_level",
    "build_two_level_structure",
    "spatial_aggregates",
    "two_level_from_values",
    "build_bsr_structure",
    "bsr_diagonal",
    "bsr_expand",
    "bsr_matvec",
    "bsr_reduce",
    "bsr_values_from_local",
    "get_bsr_structure",
    "block_two_level_from_values",
    "batched_small_inv",
    "default_aggregate_size",
    "smoothed_two_level_matrix_free",
]
