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
    """P1/P2 basis on the glued global DOFs of a flat fracture network."""

    def __init__(self, mesh, element):
        super().__init__(mesh, element)

        # tangential 3D gradients: per-cell gather of the fracture
        # pseudo-inverse — (T, 1, n_loc, 2) @ (T, 1, 2, 3) -> (T, 1, n_loc, 3)
        cell_frac = mesh["cells", "fracture"][:, 0]
        inv_frac = mesh["fracture_map", "inv_jacobian"][cell_frac][:, None]
        self.v_grad = self.v_grad @ inv_frac
        self._inv_map_jacobian = self._inv_map_jacobian @ inv_frac

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order == 1:
            global_ids = mesh["global", "ids"][:, 0]
            coords_4_global_dofs = mesh["global", "vertices_3d"]
            global_dofs_4_elements = global_ids[mesh["cells", "vertices"]]
            nodes_4_boundary_dofs = mesh["global", "markers"]

        elif element.polynomial_order == 2:
            # P2 on the glued triangulation: vertex DOFs + one DOF per
            # unique *global* edge — trace edges carry the same global
            # vertex pair in every incident fracture, so midpoint DOFs are
            # automatically shared and pressure continuity extends to P2.
            global_ids = np.asarray(mesh["global", "ids"])[:, 0]
            gverts = np.asarray(mesh["global", "vertices_3d"])
            gmark = np.asarray(mesh["global", "markers"]).reshape(-1)
            gcells = global_ids[np.asarray(mesh["cells", "vertices"])]
            n_gverts = gverts.shape[0]

            # local edge order fixed by the shared helper (mesh.topology)
            from ..mesh.topology import encode_edge_pairs, p2_cell_edge_pairs

            local = p2_cell_edge_pairs(gcells)
            edges, inverse = np.unique(
                local.reshape(-1, 2), axis=0, return_inverse=True,
            )
            cell_edges = inverse.reshape(-1, 3)
            midpoints = gverts[edges].mean(axis=1)
            # a midpoint is Dirichlet iff its global edge is a *boundary
            # edge of at least one incident fracture* (OR over fractures,
            # matching the P1 vertex rule of maximum.at over per-fracture
            # markers) and both endpoints are marked. A network-wide
            # incidence count would miss outer-boundary edges shared by two
            # glued fracture borders (counts == 2 there).
            be_pairs = np.sort(
                global_ids[np.asarray(mesh["boundary_edges", "vertices"])],
                axis=-1,
            )
            be_codes = encode_edge_pairs(be_pairs, n_gverts)
            edge_codes = encode_edge_pairs(edges, n_gverts)
            edge_mark = (
                np.isin(edge_codes, be_codes)
                & (gmark[edges[:, 0]] != 0)
                & (gmark[edges[:, 1]] != 0)
            ).astype(np.int64)

            coords_4_global_dofs = jnp.asarray(
                np.concatenate([gverts, midpoints], axis=0),
                dtype=config.default_dtype(),
            )
            global_dofs_4_elements = jnp.asarray(
                np.concatenate([gcells, cell_edges + n_gverts], axis=1),
                dtype=config.index_dtype(),
            )
            nodes_4_boundary_dofs = jnp.asarray(
                np.concatenate([gmark, edge_mark], axis=0).reshape(-1, 1),
                dtype=config.index_dtype(),
            )
        elif element.polynomial_order == 3:
            # P3 on the glued triangulation: trace edges carry the same
            # GLOBAL vertex pair in every incident fracture, so the two
            # edge DOFs (oriented toward the smaller global id, exactly as
            # in Basis P3) and their 1/3-2/3 nodes are shared across
            # fractures automatically; the barycenter bubble is per-cell.
            global_ids = np.asarray(mesh["global", "ids"])[:, 0]
            gverts = np.asarray(mesh["global", "vertices_3d"])
            gmark = np.asarray(mesh["global", "markers"]).reshape(-1)
            gcells = global_ids[np.asarray(mesh["cells", "vertices"])]
            n_gverts = gverts.shape[0]
            n_cells = gcells.shape[0]

            from ..mesh.topology import encode_edge_pairs

            directed = gcells[:, [[0, 1], [1, 2], [2, 0]]]  # (T, 3, 2)
            edges, inverse = np.unique(
                np.sort(directed.reshape(-1, 2), axis=-1),
                axis=0,
                return_inverse=True,
            )
            cell_edges = inverse.reshape(-1, 3)
            n_edges = edges.shape[0]

            forward = directed[..., 0] < directed[..., 1]
            near_i = n_gverts + 2 * cell_edges + np.where(forward, 0, 1)
            near_j = n_gverts + 2 * cell_edges + np.where(forward, 1, 0)
            edge_dofs = np.stack([near_i, near_j], axis=-1).reshape(
                n_cells, 6
            )
            bubble = n_gverts + 2 * n_edges + np.arange(n_cells)

            emin = gverts[edges.min(axis=1)]
            emax = gverts[edges.max(axis=1)]
            edge_nodes = np.stack(
                [(2 * emin + emax) / 3.0, (emin + 2 * emax) / 3.0], axis=1
            ).reshape(2 * n_edges, -1)
            centroids = gverts[gcells].mean(axis=1)

            # Dirichlet rule as in the P2 branch: the edge must be a
            # boundary edge of at least one incident fracture AND both
            # endpoints marked
            be_pairs = np.sort(
                global_ids[np.asarray(mesh["boundary_edges", "vertices"])],
                axis=-1,
            )
            be_codes = encode_edge_pairs(be_pairs, n_gverts)
            edge_codes = encode_edge_pairs(edges, n_gverts)
            edge_mark = (
                np.isin(edge_codes, be_codes)
                & (gmark[edges[:, 0]] != 0)
                & (gmark[edges[:, 1]] != 0)
            ).astype(np.int64)

            coords_4_global_dofs = jnp.asarray(
                np.concatenate([gverts, edge_nodes, centroids], axis=0),
                dtype=config.default_dtype(),
            )
            global_dofs_4_elements = jnp.asarray(
                np.concatenate(
                    [gcells, edge_dofs, bubble[:, None]], axis=1
                ),
                dtype=config.index_dtype(),
            )
            nodes_4_boundary_dofs = jnp.asarray(
                np.concatenate(
                    [
                        gmark,
                        np.repeat(edge_mark, 2),
                        np.zeros(n_cells, dtype=np.int64),
                    ]
                ).reshape(-1, 1),
                dtype=config.index_dtype(),
            )
        else:
            raise NotImplementedError("Polynomial order not implemented")

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
