"""Batched basis over B patch meshes: one-shot batched assembly and solve.

Parity target: reference ``PatchesBasis``
(/root/reference/torch_fem/basis/patches_basis.py) — assembly shapes
(B, n, n)/(B, n, 1) with a leading patch index in the scatter tuple. All
per-patch systems assemble in a single scatter-add and solve in a single
batched LU (or vmapped PCG), which is exactly the shape of work the MXU
likes: B independent tiny problems fused into one dispatch.

Note: ``reduce`` returns (B, k, k)/(B, k, 1) keeping matrix axes (the
reference collapses to (B,) via diagonal indexing and re-expands at the call
site, patches_basis.py:99-105) — batched ``jnp.linalg.inv``/``solve`` apply
directly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from .abstract_basis import AbstractBasis, register_basis_pytree


@register_basis_pytree
class PatchesBasis(AbstractBasis):
    """P1 basis over a batch of patch meshes."""

    def __init__(self, mesh, element):
        self.nb_patches = int(mesh.batch_size()[0])
        self.patches_idx = jnp.arange(
            self.nb_patches, dtype=config.index_dtype()
        )[:, None]
        super().__init__(mesh, element)

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order != 1:
            raise NotImplementedError("Polynomial order not implemented")

        coords_4_global_dofs = mesh["vertices", "coordinates"]
        global_dofs_4_elements = mesh["cells", "vertices"]
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
        nb_global_dofs = int(coords4global_dofs.shape[-2])
        nb_local_dofs = int(global_dofs4elements.shape[-1])

        # patch topology is identical across the batch: interior DOFs come
        # from the first patch's markers
        markers = self._as_host_index(nodes4boundary_dofs)[0].reshape(-1)
        inner_dofs = jnp.asarray(
            np.nonzero(markers != 1)[0], dtype=config.index_dtype()
        )

        dofs = global_dofs4elements  # (B, T, n_loc)
        rows_idx = jnp.repeat(dofs, nb_local_dofs, axis=-1).reshape(
            self.nb_patches, -1
        )
        cols_idx = jnp.tile(dofs, (1, 1, nb_local_dofs)).reshape(
            self.nb_patches, -1
        )
        form_idx = dofs.reshape(self.nb_patches, -1)

        return {
            "bilinear_form_shape": (
                self.nb_patches,
                nb_global_dofs,
                nb_global_dofs,
            ),
            "bilinear_form_idx": (self.patches_idx, rows_idx, cols_idx),
            "linear_form_shape": (self.nb_patches, nb_global_dofs, 1),
            "linear_form_idx": (self.patches_idx, form_idx),
            "inner_dofs": inner_dofs,
            "nb_dofs": nb_global_dofs,
        }

    def reshape_for_assembly(self, local, form: str):
        if form == "bilinear":
            return local.reshape(self.nb_patches, -1)
        if form == "linear":
            return local.reshape(self.nb_patches, -1, 1)
        raise NotImplementedError(f"Unknown form type: {form}")

    def _compute_jacobian_map(self, mesh, element):
        return jnp.matrix_transpose(mesh["cells", "coordinates"]) @ (
            element.barycentric_grad
        )

    def _compute_integration_points(self, mesh, bar_coords):
        return jnp.matrix_transpose(bar_coords) @ mesh["cells", "coordinates"][
            ..., None, :, :
        ]

    def _compute_integral_weights(self, element, det_map_jacobian):
        return (
            element.reference_element_area
            * element.gaussian_weights
            * det_map_jacobian
        )
