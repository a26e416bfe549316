"""Compute ops: matrix-free operators, solvers, Pallas kernels."""

from .operators import local_matvec, operator_diagonal, reduced_operator_from_local
from .solvers import cg, dense_solve, pcg

__all__ = [
    "local_matvec",
    "operator_diagonal",
    "reduced_operator_from_local",
    "cg",
    "dense_solve",
    "pcg",
]
