"""Basis layer: quadrature-evaluated shape functions, DOF maps, assembly."""

from .abstract_basis import AbstractBasis
from .basis import Basis
from .interior_edges_basis import InteriorEdgesBasis

__all__ = ["AbstractBasis", "Basis", "InteriorEdgesBasis"]
