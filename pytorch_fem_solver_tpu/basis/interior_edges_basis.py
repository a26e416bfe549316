"""1D quadrature basis over the interior edges of a 2D mesh.

Used for jump / flux functionals: ``integrate_functional`` over edges with
weights ``2 * w_q * |edge|/2``. Parity target: reference
``InteriorEdgesBasis`` (/root/reference/torch_fem/basis/interior_edges_basis.py).

The reference's edge DOF map is a placeholder copied from the cell basis and
flagged "NOT CORRECT" (interior_edges_basis.py:20-23); only functional
integration is trustworthy there. Here the DOF map is defined *correctly* as
one P1 DOF per interior-edge endpoint (global vertex ids), so linear/bilinear
edge forms assemble into vertex-indexed global tensors. Functional
integration is unchanged and remains the primary use.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from .abstract_basis import AbstractBasis, register_basis_pytree


@register_basis_pytree
class InteriorEdgesBasis(AbstractBasis):
    """P1 basis on interior edges (line elements embedded in the 2D mesh)."""

    #: mesh group the facet quadrature lives on; subclasses re-target it
    #: (boundary edges, 3D interior/boundary faces) and inherit everything
    facet_group = "interior_edges"

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order != 1:
            raise NotImplementedError("Polynomial order not implemented")

        # DOFs live on mesh vertices; each facet's local DOFs are its
        # vertex ids (correct facet-restricted P1 map, unlike the
        # reference placeholder).
        coords_4_global_dofs = mesh["vertices", "coordinates"]
        global_dofs_4_elements = mesh[self.facet_group, "vertices"]
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
        )

    def _edge_coordinates(self, mesh):
        return mesh[self.facet_group, "coordinates"]

    def _adjacent_cells(self):
        """Cell ids adjacent to each facet, shape (E, n_sides).

        Interior facets have two sides (n_sides=2, for jump terms); boundary
        facets one (n_sides=1, for flux traces). ``Basis.interpolate``
        dispatches through this so every variant shares the trace machinery.
        """
        return self.mesh[self.facet_group, "cells"]

    def _compute_jacobian_map(self, mesh, element):
        return jnp.matrix_transpose(self._edge_coordinates(mesh)) @ (
            element.barycentric_grad
        )

    def _compute_integration_points(self, mesh, bar_coords):
        return jnp.matrix_transpose(bar_coords) @ self._edge_coordinates(mesh)[
            ..., None, :, :
        ]



@register_basis_pytree
class BoundaryEdgesBasis(InteriorEdgesBasis):
    """P1 quadrature basis over the *boundary* edges of a 2D mesh.

    Beyond the reference (which supports only strong Dirichlet data):
    linear forms over this basis assemble Neumann/Robin boundary terms
    into the global vertex DOF vector —

        b += integrate_linear_form(lambda b_: g(b_.integration_points) * b_.v)

    — and ``integrate_functional`` gives boundary-flux functionals. Combine
    with partial ``vertex_markers`` (mark only the Dirichlet portion) and
    ``dirichlet_lift`` for mixed boundary-condition problems.
    """

    facet_group = "boundary_edges"
