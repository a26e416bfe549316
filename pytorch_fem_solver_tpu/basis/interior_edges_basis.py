"""1D quadrature basis over the interior edges of a 2D mesh.

Used for jump / flux functionals: ``integrate_functional`` over edges with
weights ``2 * w_q * |edge|/2``. Parity target: reference
``InteriorEdgesBasis`` (/root/reference/torch_fem/basis/interior_edges_basis.py).

The reference's edge DOF map is a placeholder copied from the cell basis and
flagged "NOT CORRECT" (interior_edges_basis.py:20-23); only functional
integration is trustworthy there. Here the DOF map is defined *correctly*:
P1 puts one DOF per facet endpoint (global vertex ids); P2/P3 add the
facet's own edge (and, in 3D, face-bubble) DOFs with the SAME numbering as
the cell ``Basis``, so facet-assembled forms land in the matching global
space at every supported order. Functional integration is unchanged and
remains the primary use.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import config
from .abstract_basis import AbstractBasis, register_basis_pytree


@register_basis_pytree
class InteriorEdgesBasis(AbstractBasis):
    """P1/P2/P3 basis on interior edges (line elements embedded in the 2D mesh)."""

    #: mesh group the facet quadrature lives on; subclasses re-target it
    #: (boundary edges, 3D interior/boundary faces) and inherit everything
    facet_group = "interior_edges"

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order == 1:
            # DOFs live on mesh vertices; each facet's local DOFs are its
            # vertex ids (correct facet-restricted P1 map, unlike the
            # reference placeholder).
            coords_4_global_dofs = mesh["vertices", "coordinates"]
            global_dofs_4_elements = mesh[self.facet_group, "vertices"]
            nodes_4_boundary_dofs = mesh["vertices", "markers"]
        elif element.polynomial_order == 2:
            # P2 facet DOFs: facet vertices + the facet's own edge-midpoint
            # DOFs, numbered IDENTICALLY to the cell Basis P2 layout
            # (n_vertices + unique-edge id), so facet-assembled linear and
            # bilinear forms land in the same global P2 space. Generic over
            # 2D edges (one midpoint: local order v0, v1, mid matches the
            # P2 ElementLine) and 3D faces (three midpoints: local edge
            # order 01, 12, 20 matches ElementTri's P2 shape functions).
            from ..mesh.topology import (
                encode_edge_pairs,
                p2_edge_dirichlet_markers,
            )

            verts = np.asarray(mesh["vertices", "coordinates"])
            edges_all = np.asarray(mesh["edges", "vertices"])
            vert_markers = np.asarray(mesh["vertices", "markers"]).reshape(-1)
            # same Dirichlet rule as the cell Basis (mixed-BC safe)
            edge_markers = p2_edge_dirichlet_markers(
                edges_all, mesh["edges", "markers"], vert_markers
            )
            fv = np.asarray(mesh[self.facet_group, "vertices"])
            n_v = verts.shape[0]
            if fv.shape[1] == 2:
                local_pairs = fv[:, None, :]  # (E, 1, 2)
            else:
                local_pairs = fv[:, [[0, 1], [1, 2], [2, 0]]]  # (F, 3, 2)

            codes_all = encode_edge_pairs(np.sort(edges_all, axis=-1), n_v)
            order = np.argsort(codes_all)
            pc = encode_edge_pairs(
                np.sort(local_pairs.reshape(-1, 2), axis=-1), n_v
            )
            pos = np.searchsorted(codes_all[order], pc)
            if (codes_all[order][pos] != pc).any():  # pragma: no cover
                raise ValueError(
                    "facet edge missing from the mesh's unique-edge table"
                )
            facet_edges = order[pos].reshape(fv.shape[0], -1)

            midpoints = verts[edges_all].mean(axis=1)
            coords_4_global_dofs = jnp.asarray(
                np.concatenate([verts, midpoints], axis=0),
                dtype=config.default_dtype(),
            )
            global_dofs_4_elements = jnp.asarray(
                np.concatenate([fv, facet_edges + n_v], axis=1),
                dtype=config.index_dtype(),
            )
            nodes_4_boundary_dofs = jnp.asarray(
                np.concatenate([vert_markers, edge_markers], axis=0).reshape(
                    -1, 1
                ),
                dtype=config.index_dtype(),
            )
        elif element.polynomial_order == 3:
            # P3 facet DOFs, numbered identically to the cell Basis P3
            # layout: two oriented DOFs per unique edge (n_v + 2e nearer
            # the min endpoint) and the bubble block (2D: per-cell
            # barycenter, never on a facet; 3D: per-face barycenter — a
            # boundary face's own bubble). Local slot order matches the
            # P3 ElementLine / ElementTri(Surface).
            from ..mesh.topology import (
                encode_edge_pairs,
                p2_edge_dirichlet_markers,
            )

            verts = np.asarray(mesh["vertices", "coordinates"])
            edges_all = np.asarray(mesh["edges", "vertices"])
            vert_markers = np.asarray(mesh["vertices", "markers"]).reshape(-1)
            edge_markers = p2_edge_dirichlet_markers(
                edges_all, mesh["edges", "markers"], vert_markers
            )
            fv = np.asarray(mesh[self.facet_group, "vertices"])
            n_v = verts.shape[0]
            n_e = edges_all.shape[0]
            if fv.shape[1] == 2:
                directed = fv[:, None, :]  # (E, 1, 2): the facet itself
            else:
                directed = fv[:, [[0, 1], [1, 2], [2, 0]]]  # (F, 3, 2)

            codes_all = encode_edge_pairs(
                np.sort(edges_all, axis=-1), n_v
            )
            order = np.argsort(codes_all)
            pc = encode_edge_pairs(
                np.sort(directed.reshape(-1, 2), axis=-1), n_v
            )
            pos = np.searchsorted(codes_all[order], pc)
            if (codes_all[order][pos] != pc).any():  # pragma: no cover
                raise ValueError(
                    "facet edge missing from the mesh's unique-edge table"
                )
            facet_edges = order[pos].reshape(directed.shape[:2])
            forward = directed[..., 0] < directed[..., 1]
            near_i = n_v + 2 * facet_edges + np.where(forward, 0, 1)
            near_j = n_v + 2 * facet_edges + np.where(forward, 1, 0)
            edge_dofs = np.stack([near_i, near_j], axis=-1).reshape(
                fv.shape[0], -1
            )

            emin = verts[edges_all.min(axis=1)]
            emax = verts[edges_all.max(axis=1)]
            edge_nodes = np.stack(
                [(2 * emin + emax) / 3.0, (emin + 2 * emax) / 3.0], axis=1
            ).reshape(2 * n_e, -1)

            cells = np.asarray(mesh["cells", "vertices"])
            if fv.shape[1] == 2:
                # 2D: bubble block = per-cell barycenters; none on facets
                bubble_coords = verts[cells].mean(axis=1)
                bubble_marks = np.zeros(cells.shape[0], dtype=np.int64)
                dofs = np.concatenate([fv, edge_dofs], axis=1)
            else:
                # 3D: bubble block = per-face barycenters; the facet's own
                # bubble is its face id in the mesh's unique-face table
                faces = np.asarray(mesh["faces", "vertices"])  # sorted
                face_markers = np.asarray(
                    mesh["faces", "markers"]
                ).reshape(-1)
                if n_v**3 >= 2**62:  # pragma: no cover
                    raise NotImplementedError(
                        "P3 face matching overflows the scalar face code"
                    )
                fcodes = (
                    faces[:, 0].astype(np.int64) * n_v + faces[:, 1]
                ) * n_v + faces[:, 2]
                forder = np.argsort(fcodes)
                own = np.sort(fv, axis=1)
                owncodes = (
                    own[:, 0].astype(np.int64) * n_v + own[:, 1]
                ) * n_v + own[:, 2]
                face_ids = forder[
                    np.searchsorted(fcodes[forder], owncodes)
                ]
                dofs = np.concatenate(
                    [fv, edge_dofs, (n_v + 2 * n_e + face_ids)[:, None]],
                    axis=1,
                )
                bubble_coords = verts[faces].mean(axis=1)
                fm = vert_markers[faces]
                bubble_marks = np.where(
                    (face_markers != 0) & (fm != 0).all(axis=1),
                    fm.max(axis=1),
                    0,
                ).astype(np.int64)

            coords_4_global_dofs = jnp.asarray(
                np.concatenate([verts, edge_nodes, bubble_coords], axis=0),
                dtype=config.default_dtype(),
            )
            global_dofs_4_elements = jnp.asarray(
                dofs, dtype=config.index_dtype()
            )
            nodes_4_boundary_dofs = jnp.asarray(
                np.concatenate(
                    [vert_markers, np.repeat(edge_markers, 2), bubble_marks]
                ).reshape(-1, 1),
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
