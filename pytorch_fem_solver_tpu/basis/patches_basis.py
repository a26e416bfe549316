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
    """P1/P2/P3 basis over a batch of patch meshes (the reference's patches
    are P1-only, torch_fem/basis/patches_basis.py)."""

    def __init__(self, mesh, element):
        self.nb_patches = int(mesh.batch_size()[0])
        self.patches_idx = jnp.arange(
            self.nb_patches, dtype=config.index_dtype()
        )[:, None]
        super().__init__(mesh, element)

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order == 1:
            coords_4_global_dofs = mesh["vertices", "coordinates"]
            global_dofs_4_elements = mesh["cells", "vertices"]
            nodes_4_boundary_dofs = mesh["vertices", "markers"]

        elif element.polynomial_order == 2:
            # P2 on the shared patch template: every patch has identical
            # topology (template broadcast, mesh/patches.py), so the
            # edge-DOF map is derived ONCE from batch entry 0 and tiled;
            # only the midpoint coordinates are per patch.
            from ..mesh.topology import (
                p2_edge_dirichlet_markers,
                unique_edge_ids,
            )

            verts = mesh["vertices", "coordinates"]  # (B, n_v, d)
            cells0 = np.asarray(mesh["cells", "vertices"])[0]
            edges0 = np.asarray(mesh["edges", "vertices"])[0]
            vmark0 = np.asarray(mesh["vertices", "markers"])[0].reshape(-1)
            emark0 = np.asarray(mesh["edges", "markers"])[0]
            n_v = int(verts.shape[-2])
            B = self.nb_patches

            cell_edges = unique_edge_ids(cells0, edges0, n_v)
            dofs0 = np.concatenate([cells0, n_v + cell_edges], axis=1)
            global_dofs_4_elements = jnp.asarray(
                np.broadcast_to(dofs0, (B,) + dofs0.shape),
                dtype=config.index_dtype(),
            )

            midpoints = verts[:, jnp.asarray(edges0)].mean(axis=-2)
            coords_4_global_dofs = jnp.concatenate(
                [verts, midpoints], axis=-2
            )

            edge_mark = p2_edge_dirichlet_markers(edges0, emark0, vmark0)
            marks0 = np.concatenate([vmark0, edge_mark]).reshape(-1, 1)
            nodes_4_boundary_dofs = jnp.asarray(
                np.broadcast_to(marks0, (B,) + marks0.shape),
                dtype=config.index_dtype(),
            )
        elif element.polynomial_order == 3:
            # P3 on the shared patch template (closes the last order-matrix
            # cell, docs/parity.md): topology from batch entry 0 like P2 —
            # two DOFs per unique edge at 1/3 and 2/3, oriented toward the
            # smaller-endpoint vertex, plus one barycenter bubble per cell;
            # only the node coordinates are per patch. Local slot order
            # matches element_tri.py (per local edge: near-i then near-j,
            # bubble last).
            from ..mesh.topology import (
                p2_edge_dirichlet_markers,
                unique_edge_ids,
            )

            verts = mesh["vertices", "coordinates"]  # (B, n_v, d)
            cells0 = np.asarray(mesh["cells", "vertices"])[0]
            edges0 = np.asarray(mesh["edges", "vertices"])[0]
            vmark0 = np.asarray(mesh["vertices", "markers"])[0].reshape(-1)
            emark0 = np.asarray(mesh["edges", "markers"])[0]
            n_v = int(verts.shape[-2])
            n_e = int(edges0.shape[0])
            n_c = int(cells0.shape[0])
            B = self.nb_patches

            cell_edges = unique_edge_ids(cells0, edges0, n_v)
            directed = cells0[:, [[0, 1], [1, 2], [2, 0]]]
            forward = directed[..., 0] < directed[..., 1]  # (T, 3)
            near_i = n_v + 2 * cell_edges + np.where(forward, 0, 1)
            near_j = n_v + 2 * cell_edges + np.where(forward, 1, 0)
            edge_dofs = np.stack([near_i, near_j], axis=-1).reshape(n_c, -1)
            bubble_dofs = (n_v + 2 * n_e + np.arange(n_c))[:, None]
            dofs0 = np.concatenate([cells0, edge_dofs, bubble_dofs], axis=1)
            global_dofs_4_elements = jnp.asarray(
                np.broadcast_to(dofs0, (B,) + dofs0.shape),
                dtype=config.index_dtype(),
            )

            emin = verts[:, jnp.asarray(edges0.min(axis=1))]  # (B, n_e, d)
            emax = verts[:, jnp.asarray(edges0.max(axis=1))]
            edge_nodes = jnp.stack(
                [(2 * emin + emax) / 3.0, (emin + 2 * emax) / 3.0], axis=2
            ).reshape(B, 2 * n_e, -1)
            bubble_coords = verts[:, jnp.asarray(cells0)].mean(axis=2)
            coords_4_global_dofs = jnp.concatenate(
                [verts, edge_nodes, bubble_coords], axis=-2
            )

            edge_mark = p2_edge_dirichlet_markers(edges0, emark0, vmark0)
            marks0 = np.concatenate(
                [vmark0, np.repeat(edge_mark, 2), np.zeros(n_c, np.int64)]
            ).reshape(-1, 1)
            nodes_4_boundary_dofs = jnp.asarray(
                np.broadcast_to(marks0, (B,) + marks0.shape),
                dtype=config.index_dtype(),
            )
        else:
            raise NotImplementedError("Polynomial order not implemented")

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
            batch_size=self.nb_patches,
        )

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

