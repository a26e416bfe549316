"""Quadrature basis over interior edges of fracture meshes (in 3D).

Parity target: reference ``InteriorEdgesFractureBasis``
(/root/reference/torch_fem/basis/interior_edges_fracture_basis.py), used for
normal-flux jump terms across element edges and fracture traces.

Design fix vs the reference: quadrature geometry is built directly from the
*lifted 3D* edge coordinates, so the arc-length element is exact for any
affine fracture map. The reference instead multiplies the 2D edge measure by
the fracture *area* scale (interior_edges_fracture_basis.py:65-73), which is
only correct for isometric embeddings. DOFs are the per-fracture edge
endpoint vertices (the reference ships a placeholder flagged "NOT CORRECT",
:21-25).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from .abstract_basis import AbstractBasis, register_basis_pytree


@register_basis_pytree
class InteriorEdgesFractureBasis(AbstractBasis):
    """P1 edge basis over the interior edges of each fracture, embedded in 3D."""

    def __init__(self, mesh, element):
        self.nb_fractures = int(mesh.batch_size()[0])
        super().__init__(mesh, element)

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order != 1:
            raise NotImplementedError("Polynomial order not implemented")

        coords_4_global_dofs = mesh["vertices", "coordinates_3d"]
        global_dofs_4_elements = mesh["interior_edges", "vertices"]  # (B, Ei, 2)
        nodes_4_boundary_dofs = mesh["vertices", "markers"]

        coords_4_elements = mesh.compute_coordinates_4_cells(
            coords_4_global_dofs, global_dofs_4_elements
        )

        return (
            coords_4_global_dofs,
            global_dofs_4_elements,
            nodes_4_boundary_dofs,
            coords_4_elements,
        )

    def _compute_basis_parameters(
        self, coords4global_dofs, global_dofs4elements, nodes4boundary_dofs
    ):
        return self._build_assembly_parameters(
            int(coords4global_dofs.shape[-2]),
            global_dofs4elements,
            nodes4boundary_dofs,
            batch_size=self.nb_fractures,
        )

    def reshape_for_assembly(self, local, form: str):
        if form == "bilinear":
            return local.reshape(self.nb_fractures, -1)
        if form == "linear":
            return local.reshape(self.nb_fractures, -1, 1)
        raise NotImplementedError(f"Unknown form type: {form}")

    def _compute_jacobian_map(self, mesh, element):
        # 3D edge coordinates: the metric includes the fracture stretch
        return jnp.matrix_transpose(
            mesh["interior_edges", "coordinates_3d"]
        ) @ element.barycentric_grad

    def _compute_integration_points(self, mesh, bar_coords):
        return jnp.matrix_transpose(bar_coords) @ mesh[
            "interior_edges", "coordinates_3d"
        ][..., None, :, :]


