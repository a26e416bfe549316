"""3D tetrahedral mesh as a frozen JAX pytree.

3D extension beyond the 2D-only reference library (its mesh layer stops at
``torch_fem/mesh/mesh_tri.py``): same frozen-pytree design as
:class:`MeshTri` — all topology derived once on the host (NumPy, dynamic
shapes), then frozen into static-shape device arrays grouped in a nested
dict. Faces take over the structural role edges play in 2D (interior/
boundary split, adjacency, normals); unique edges are kept as well because
P2 DOFs live on them.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from .mesh_tri import MeshTri
from .topology import (
    TET_EDGE_PERMUTATIONS,
    TET_FACE_PERMUTATIONS,
    build_tet_topology,
)


class MeshTet(MeshTri):
    """A single 3D tetrahedral mesh with fully precomputed topology.

    Construction math runs on the host CPU device (``config.HostConstructed``)
    — eager dispatch to a tunneled TPU costs ~31 ms RTT per op.
    """

    #: local vertex pairs of the 6 tet edges
    edge_permutations = TET_EDGE_PERMUTATIONS
    #: local vertex triples of the 4 tet faces
    face_permutations = TET_FACE_PERMUTATIONS

    @staticmethod
    def _normalize_triangulation(triangulation: dict[str, Any]) -> dict[str, Any]:
        """Accept ``tetrahedra``, ``cells`` or (tetgen-style) ``tets`` keys."""
        t = dict(triangulation)
        for key in ("cells", "tets"):
            if "tetrahedra" not in t and key in t:
                t["tetrahedra"] = t[key]
        return t

    def _build_groups(self, triangulation: dict[str, Any]) -> dict:
        t = self._normalize_triangulation(triangulation)
        vertices = np.asarray(t["vertices"], dtype=np.float64)
        tets = np.asarray(t["tetrahedra"], dtype=np.int64)
        vertex_markers = t.get("vertex_markers")

        topo = build_tet_topology(vertices, tets, vertex_markers)

        return {
            "vertices": {
                "coordinates": vertices,
                "markers": topo["vertex_markers"],
            },
            "cells": {
                "vertices": tets,
                "coordinates": vertices[tets],
                "length": topo["cells_min_length"],
            },
            "edges": {
                "vertices": topo["edges_vertices"],
                "markers": topo["edges_markers"],
            },
            "faces": {
                "vertices": topo["faces_vertices"],
                "markers": topo["faces_markers"],
            },
            "interior_faces": {
                "vertices": topo["interior_faces_vertices"],
                "cells": topo["interior_faces_cells"],
                "coordinates": vertices[topo["interior_faces_vertices"]],
                "area": topo["interior_faces_area"],
                "normals": topo["interior_faces_normals"],
            },
            "boundary_faces": {
                "vertices": topo["boundary_faces_vertices"],
                "cells": topo["boundary_faces_cells"],
                "coordinates": vertices[topo["boundary_faces_vertices"]],
            },
        }

    @property
    def n_interior_faces(self) -> int:
        return int(self["interior_faces", "vertices"].shape[-2])

    @property
    def n_interior_edges(self) -> int:  # pragma: no cover - 2D-only concept
        raise AttributeError("MeshTet has faces, not interior edges")


def _mesh_flatten(mesh: MeshTet):
    return (mesh._t,), type(mesh)


def _mesh_unflatten(aux, children):
    cls = aux
    obj = cls.__new__(cls)
    obj._t = children[0]
    return obj


jax.tree_util.register_pytree_node(MeshTet, _mesh_flatten, _mesh_unflatten)
