"""2D triangular mesh as a frozen JAX pytree.

Replaces the reference's TensorDict-backed ``AbstractMesh``/``MeshTri``
(/root/reference/torch_fem/mesh/abstract_mesh.py:10-317, mesh_tri.py:1-12)
with a TPU-native design: all topology is derived once on the host (NumPy,
dynamic shapes), then frozen into static-shape device arrays grouped in a
nested dict. Meshes are registered pytrees, so they can be passed through
``jax.jit`` / ``shard_map`` boundaries or closed over freely.

Indexing parity: ``mesh["cells", "vertices"]``, ``mesh["interior_edges"]``
work like the reference's TensorDict access.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .topology import TRI_EDGE_PERMUTATIONS, build_tri_topology


def _freeze(tree):
    """Convert a nested dict of NumPy arrays to device arrays.

    Float arrays take the library default dtype; integer arrays become int32
    (index arrays never need 64 bits at the supported scales and int32 indexes
    faster on TPU).
    """

    def leaf(x):
        x = np.asarray(x)
        if np.issubdtype(x.dtype, np.floating):
            return jnp.asarray(x, dtype=config.default_dtype())
        return jnp.asarray(x, dtype=config.index_dtype())

    return jax.tree_util.tree_map(leaf, tree)


class MeshTri(config.HostConstructed):
    """A single 2D triangle mesh with fully precomputed topology.

    Construction math runs on the host CPU device (``config.HostConstructed``)
    — eager dispatch to a tunneled TPU costs ~31 ms RTT per op.
    """

    #: local vertex pairs of the 3 triangle edges
    edge_permutations = TRI_EDGE_PERMUTATIONS

    def __init__(self, triangulation: dict[str, Any] | None = None, *, _groups=None):
        if _groups is not None:
            self._t = _groups
            return
        if triangulation is None:
            raise ValueError("MeshTri requires a triangulation dict")
        self._t = _freeze(self._build_groups(triangulation))

    # -- construction -----------------------------------------------------

    @staticmethod
    def _normalize_triangulation(triangulation: dict[str, Any]) -> dict[str, Any]:
        """Accept both our schema and triangle-library key spellings."""
        t = dict(triangulation)
        if "triangles" not in t and "cells" in t:
            t["triangles"] = t["cells"]
        return t

    def _build_groups(self, triangulation: dict[str, Any]) -> dict:
        t = self._normalize_triangulation(triangulation)
        vertices = np.asarray(t["vertices"], dtype=np.float64)
        triangles = np.asarray(t["triangles"], dtype=np.int64)
        vertex_markers = t.get("vertex_markers")

        topo = build_tri_topology(vertices, triangles, vertex_markers)

        return {
            "vertices": {
                "coordinates": vertices,
                "markers": topo["vertex_markers"],
            },
            "cells": {
                "vertices": triangles,
                "coordinates": vertices[triangles],
                "length": topo["cells_min_length"],
            },
            "edges": {
                "vertices": topo["edges_vertices"],
                "markers": topo["edges_markers"],
            },
            "interior_edges": {
                "vertices": topo["interior_edges_vertices"],
                "cells": topo["interior_edges_cells"],
                "coordinates": vertices[topo["interior_edges_vertices"]],
                "length": topo["interior_edges_length"],
                "normals": topo["interior_edges_normals"],
            },
            "boundary_edges": {
                "vertices": topo["boundary_edges_vertices"],
                "cells": topo["boundary_edges_cells"],
                "coordinates": vertices[topo["boundary_edges_vertices"]],
            },
        }

    # -- TensorDict-style access ------------------------------------------

    def __getitem__(self, key: str | Tuple[str, ...]):
        node = self._t
        if isinstance(key, tuple):
            for k in key:
                node = node[k]
            return node
        return node[key]

    def __setitem__(self, key: str | Tuple[str, ...], value):
        if isinstance(key, tuple):
            node = self._t
            for k in key[:-1]:
                node = node.setdefault(k, {})
            node[key[-1]] = value
        else:
            self._t[key] = value

    def __contains__(self, key) -> bool:
        try:
            self[key]
            return True
        except KeyError:
            return False

    # -- sizes ------------------------------------------------------------

    def refined(self, marked):
        """Adaptively refined copy: conforming longest-edge bisection of
        the marked cells (``mesh.refinement``). Mirrors
        ``FractureNetworkMesh.refined`` so estimator-driven loops read the
        same on every mesh family."""
        import numpy as np

        tri = {
            "vertices": np.asarray(self["vertices", "coordinates"]),
            "vertex_markers": np.asarray(self["vertices", "markers"]),
        }
        cells = np.asarray(self["cells", "vertices"])
        if cells.shape[-1] == 4:
            from .refinement import refine_adaptive_tet

            tri["tetrahedra"] = cells
            return type(self)(refine_adaptive_tet(tri, marked))
        from .refinement import refine_adaptive

        tri["triangles"] = cells
        return type(self)(refine_adaptive(tri, marked))

    @property
    def n_vertices(self) -> int:
        return int(self["vertices", "coordinates"].shape[-2])

    @property
    def n_cells(self) -> int:
        return int(self["cells", "vertices"].shape[-2])

    @property
    def n_interior_edges(self) -> int:
        return int(self["interior_edges", "vertices"].shape[-2])

    @property
    def dim(self) -> int:
        return int(self["vertices", "coordinates"].shape[-1])

    def batch_size(self):
        """Leading batch dims (empty for a single mesh); reference parity."""
        return ()

    # -- gathers ----------------------------------------------------------

    @staticmethod
    def compute_coordinates_4_cells(coordinates_4_vertices, vertices_4_cells):
        """Gather per-cell data: out[c, i] = coords[cells[c, i]]."""
        return coordinates_4_vertices[vertices_4_cells]


def _mesh_flatten(mesh: MeshTri):
    return (mesh._t,), type(mesh)


def _mesh_unflatten(aux, children):
    cls = aux
    obj = cls.__new__(cls)
    obj._t = children[0]
    return obj


for _cls in (MeshTri,):
    jax.tree_util.register_pytree_node(_cls, _mesh_flatten, _mesh_unflatten)
