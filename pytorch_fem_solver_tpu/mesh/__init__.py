"""Mesh layer: host-built, statically-shaped triangle meshes as pytrees."""

from .generation import (
    box,
    fichera_corner,
    rectangle,
    refine_uniform,
    refine_uniform_tet,
    unit_cube,
    unit_square,
)
from .refinement import dorfler_mark, refine_adaptive, refine_adaptive_tet
from .mesh_tet import MeshTet
from .mesh_tri import MeshTri
from .meshes_tri import MeshesTri
from .fracture_network import FractureNetworkMesh
from .fractures_tri import FracturesTri
from .pslg import triangulate_pslg
from .quality import (
    quality_report,
    tet_min_dihedral_angles,
    tet_quality_report,
    triangle_min_angles,
)
from .patches import Patches

__all__ = [
    "MeshTet",
    "MeshTri",
    "MeshesTri",
    "FracturesTri",
    "FractureNetworkMesh",
    "triangulate_pslg",
    "triangle_min_angles",
    "quality_report",
    "tet_min_dihedral_angles",
    "tet_quality_report",
    "Patches",
    "box",
    "fichera_corner",
    "rectangle",
    "unit_cube",
    "dorfler_mark",
    "refine_adaptive",
    "refine_adaptive_tet",
    "refine_uniform",
    "refine_uniform_tet",
    "unit_square",
]
