"""Discrete fracture networks: B planar 2D meshes embedded affinely in 3D.

Parity target: reference ``FracturesTri``
(/root/reference/torch_fem/mesh/fractures_tri.py) — per-fracture affine map
fit from 3 corner correspondences, 3D lifts of vertices/cells/edge normals,
area scale and tangential pseudo-inverse.

Deliberate fixes over the reference (SURVEY.md §2 "quirks"):

* interior-edge normals are lifted as *directions* (J @ n, unit-normalized);
  the reference adds the translation vector (fractures_tri.py:29-33), which
  silently works only when the translation is zero;
* interior-edge 3D coordinates are stored so edge quadrature can use the true
  3D metric (correct for anisotropic fracture maps, where the reference's
  area-scale factor is only valid for isometries).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh_tri import _mesh_flatten, _mesh_unflatten
from .meshes_tri import MeshesTri


class FracturesTri(MeshesTri):
    """Batch of fracture meshes with their 2D -> 3D affine embeddings."""

    def __init__(
        self,
        triangulations: Optional[Sequence[dict]] = None,
        fractures_3d_data=None,
        anchor_vertices_2d=None,
        *,
        _groups=None,
    ):
        if _groups is not None:
            self._t = _groups
            return
        super().__init__(triangulations)

        self._compute_fracture_map(
            jnp.asarray(fractures_3d_data), anchor_vertices_2d
        )

        jac = self["jacobian_fracture_map"]  # (B, 3, 2)
        trans = self["translation_vector"]  # (B, 3, 1)

        self["vertices", "coordinates_3d"] = jnp.matrix_transpose(
            jac @ jnp.matrix_transpose(self["vertices", "coordinates"]) + trans
        )
        self["cells", "coordinates_3d"] = self.compute_coordinates_4_cells(
            self["vertices", "coordinates_3d"], self["cells", "vertices"]
        )
        self["interior_edges", "coordinates_3d"] = self.compute_coordinates_4_cells(
            self["vertices", "coordinates_3d"], self["interior_edges", "vertices"]
        )

        # lift normals with the pseudo-inverse transpose J (J^T J)^{-1} n =
        # (n_row @ inv_jac): in-plane AND perpendicular to the lifted edge
        # for any (also anisotropic) affine chart; J @ n would only be
        # correct for isometries
        normals = self["interior_edges", "normals"]  # (B, Ei, 1, 2)
        inv_jac = self["inv_jacobian_fracture_map"]  # (B, 2, 3)
        lifted = normals @ inv_jac[:, None]
        self["interior_edges", "normals_3d"] = lifted / jnp.linalg.norm(
            lifted, axis=-1, keepdims=True
        )

    def _compute_fracture_map(self, fractures_3d_data, anchor_vertices_2d=None):
        """Fit x_3d = J @ x_2d + t from 3 corner pairs per fracture.

        ``fractures_3d_data`` (B, >=3, 3): 3D images of the first three mesh
        vertices (or of ``anchor_vertices_2d`` when given). Solving the 3x3
        extended system mirrors fractures_tri.py:35-48.
        """
        if anchor_vertices_2d is None:
            vertices_2d = self["vertices", "coordinates"][:, :3, :]
        else:
            vertices_2d = jnp.asarray(anchor_vertices_2d)[:, :3, :]
        vertices_3d = fractures_3d_data[:, :3, :]

        # collinear anchors make the 3x3 system singular and would poison
        # the whole mesh with silent NaNs (the default anchors — the first
        # three mesh vertices — ARE collinear for structured grids)
        v2 = np.asarray(vertices_2d)
        area2 = np.abs(
            (v2[:, 1, 0] - v2[:, 0, 0]) * (v2[:, 2, 1] - v2[:, 0, 1])
            - (v2[:, 1, 1] - v2[:, 0, 1]) * (v2[:, 2, 0] - v2[:, 0, 0])
        )
        scale = np.maximum(np.abs(v2).max(axis=(1, 2)) ** 2, 1.0)
        if (area2 < 1e-12 * scale).any():
            bad = int(np.argmax(area2 < 1e-12 * scale))
            raise ValueError(
                f"fracture {bad}: anchor vertices are (nearly) collinear; "
                "pass anchor_vertices_2d with three non-collinear points "
                "matching rows of fractures_3d_data"
            )

        extended = jnp.concatenate(
            [vertices_2d, jnp.ones_like(vertices_3d[..., :1])], axis=-1
        )  # (B, 3, 3)

        linear_equation = jnp.matrix_transpose(vertices_3d) @ jnp.matrix_transpose(
            jnp.linalg.inv(extended)
        )  # (B, 3, 3)

        jac = linear_equation[..., :2]  # (B, 3, 2)
        translation = linear_equation[..., 2:]  # (B, 3, 1)

        j1 = jac[..., 0]
        j2 = jac[..., 1]
        det = jnp.linalg.norm(jnp.cross(j1, j2), axis=-1)[..., None, None]  # (B,1,1)

        # Moore-Penrose pseudo-inverse: tangential-gradient projector
        inv_jac = jnp.linalg.inv(jnp.matrix_transpose(jac) @ jac) @ (
            jnp.matrix_transpose(jac)
        )  # (B, 2, 3)

        self["jacobian_fracture_map"] = jac
        self["inv_jacobian_fracture_map"] = inv_jac
        self["det_jacobian_fracture_map"] = det
        self["translation_vector"] = translation


jax.tree_util.register_pytree_node(FracturesTri, _mesh_flatten, _mesh_unflatten)
