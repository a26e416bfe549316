"""Compute ops: matrix-free operators, sparse formats, solvers, kernels."""

from .operators import local_matvec, operator_diagonal, reduced_operator_from_local
from .precondition import (
    build_smoothed_two_level,
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
]
