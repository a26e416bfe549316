"""Basis over a flat (ragged) fracture network.

Beyond-reference component pairing with
:class:`~pytorch_fem_solver_tpu.mesh.fracture_network.FractureNetworkMesh`:
the same math as :class:`FractureBasis` (global-DOF assembly, tangential
gradients, fracture area scales) on one concatenated cell axis, so it
handles fractures of arbitrary, different sizes — the layout the
seven-fractures benchmark needs, and the one that shards best.

Inherits all of :class:`Basis`'s machinery (assembly, solve, edge
interpolation); only the DOF source (glued global ids), the per-cell
fracture-map corrections, and the 3D quadrature geometry differ.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from .abstract_basis import register_basis_pytree
from .basis import Basis
from .interior_edges_basis import InteriorEdgesBasis


@register_basis_pytree
class FractureNetworkBasis(Basis):
    """P1 basis on the glued global DOFs of a flat fracture network."""

    def __init__(self, mesh, element):
        super().__init__(mesh, element)

        # tangential 3D gradients: per-cell gather of the fracture
        # pseudo-inverse — (T, 1, n_loc, 2) @ (T, 1, 2, 3) -> (T, 1, n_loc, 3)
        cell_frac = mesh["cells", "fracture"][:, 0]
        inv_frac = mesh["fracture_map", "inv_jacobian"][cell_frac][:, None]
        self.v_grad = self.v_grad @ inv_frac
        self._inv_map_jacobian = self._inv_map_jacobian @ inv_frac

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order != 1:
            raise NotImplementedError("Polynomial order not implemented")

        global_ids = mesh["global", "ids"][:, 0]
        coords_4_global_dofs = mesh["global", "vertices_3d"]
        global_dofs_4_elements = global_ids[mesh["cells", "vertices"]]  # (T, 3)
        nodes_4_boundary_dofs = mesh["global", "markers"]

        coords_4_elements = coords_4_global_dofs[global_dofs_4_elements]

        return (
            coords_4_global_dofs,
            global_dofs_4_elements,
            nodes_4_boundary_dofs,
            coords_4_elements,
        )

    def _compute_integration_points(self, mesh, bar_coords):
        return jnp.matrix_transpose(bar_coords) @ mesh["cells", "coordinates_3d"][
            ..., None, :, :
        ]

    def _compute_integral_weights(self, element, det_map_jacobian):
        cell_frac = self.mesh["cells", "fracture"][:, 0]
        scale = self.mesh["fracture_map", "det"][cell_frac][..., None]  # (T,1,1,1)
        return (
            element.reference_element_area
            * element.gaussian_weights
            * det_map_jacobian
            * scale
        )

    def _interp_cell_coordinates(self):
        return self.mesh["cells", "coordinates_3d"]


@register_basis_pytree
class InteriorEdgesNetworkBasis(InteriorEdgesBasis):
    """Edge quadrature basis over a flat fracture network, embedded in 3D.

    Used for flux-jump functionals across element edges and traces; the edge
    metric comes from the lifted 3D coordinates (exact for any affine map).
    """

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order != 1:
            raise NotImplementedError("Polynomial order not implemented")

        global_ids = mesh["global", "ids"][:, 0]
        coords_4_global_dofs = mesh["global", "vertices_3d"]
        global_dofs_4_elements = global_ids[mesh["interior_edges", "vertices"]]
        nodes_4_boundary_dofs = mesh["global", "markers"]

        coords_4_elements = coords_4_global_dofs[global_dofs_4_elements]

        return (
            coords_4_global_dofs,
            global_dofs_4_elements,
            nodes_4_boundary_dofs,
            coords_4_elements,
        )

    def _edge_coordinates(self, mesh):
        return mesh["interior_edges", "coordinates_3d"]
