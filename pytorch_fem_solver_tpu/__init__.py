"""TPU-native FEM + VPINN framework (JAX / XLA / Pallas).

A ground-up rebuild of the capabilities of ``pytorch_fem_solver``
(reference: Nicolas-Zamorano/pytorch_fem_solver) designed for TPUs:
host-built static-shape meshes, jit-compiled assembly via scatter-add,
matrix-free Jacobi-PCG solves, Pallas element kernels, and shard_map-based
multi-chip scaling.

Public API parity with the reference's flat exports
(/root/reference/torch_fem/__init__.py:3-28).
"""

from . import config
from .basis import (
    AbstractBasis,
    Basis,
    FractureBasis,
    FractureNetworkBasis,
    BoundaryEdgesBasis,
    BoundaryFacesBasis,
    InteriorFacesBasis,
    InteriorEdgesBasis,
    InteriorEdgesFractureBasis,
    InteriorEdgesNetworkBasis,
    PatchesBasis,
    VectorBasis,
)
from .element import ElementLine, ElementTet, ElementTri, ElementTriSurface
from .mesh import (
    FractureNetworkMesh,
    FracturesTri,
    MeshTet,
    MeshTri,
    MeshesTri,
    Patches,
    box,
    rectangle,
    refine_uniform,
    refine_uniform_tet,
    unit_cube,
    unit_square,
)
from .mesh import quality_report, triangle_min_angles, triangulate_pslg
from .models import FeedForwardNeuralNetwork, Model

__all__ = [
    "config",
    "AbstractBasis",
    "Basis",
    "FractureBasis",
    "FractureNetworkBasis",
    "InteriorEdgesNetworkBasis",
    "FractureNetworkMesh",
    "triangulate_pslg",
    "triangle_min_angles",
    "quality_report",
    "BoundaryEdgesBasis",
    "BoundaryFacesBasis",
    "InteriorFacesBasis",
    "InteriorEdgesBasis",
    "InteriorEdgesFractureBasis",
    "PatchesBasis",
    "VectorBasis",
    "ElementLine",
    "ElementTet",
    "ElementTri",
    "ElementTriSurface",
    "MeshTet",
    "MeshTri",
    "MeshesTri",
    "FracturesTri",
    "Patches",
    "FeedForwardNeuralNetwork",
    "Model",
    "box",
    "rectangle",
    "refine_uniform",
    "refine_uniform_tet",
    "unit_cube",
    "unit_square",
]

__version__ = "0.1.0"
