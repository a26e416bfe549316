"""Basis layer: quadrature-evaluated shape functions, DOF maps, assembly."""

from .abstract_basis import AbstractBasis
from .basis import Basis
from .fracture_basis import FractureBasis, build_global_triangulation
from .fracture_network_basis import FractureNetworkBasis, InteriorEdgesNetworkBasis
from .faces_basis import BoundaryFacesBasis, InteriorFacesBasis
from .interior_edges_basis import BoundaryEdgesBasis, InteriorEdgesBasis
from .interior_edges_fracture_basis import InteriorEdgesFractureBasis
from .patches_basis import PatchesBasis
from .vector_basis import VectorBasis

__all__ = [
    "AbstractBasis",
    "Basis",
    "FractureBasis",
    "FractureNetworkBasis",
    "InteriorEdgesNetworkBasis",
    "BoundaryEdgesBasis",
    "BoundaryFacesBasis",
    "InteriorEdgesBasis",
    "InteriorFacesBasis",
    "InteriorEdgesFractureBasis",
    "PatchesBasis",
    "VectorBasis",
    "build_global_triangulation",
]
