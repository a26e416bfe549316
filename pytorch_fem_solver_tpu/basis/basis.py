"""Cell-volume basis on a single triangle mesh.

Parity target: reference ``Basis`` (/root/reference/torch_fem/basis/basis.py).
Differences by design:

* P2 DOFs are fully supported (the reference ships P2 shape functions but its
  DOF map is commented out, basis.py:26-49);
* scatter indices are laid out so that local entry (i, j) lands at global
  (row_i, col_j) — the reference assembles the transpose, which only matters
  for non-symmetric forms (basis.py:73-74);
* interior-DOF lists are computed host-side once (dynamic shapes never reach
  jit).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .. import config
from .abstract_basis import AbstractBasis, register_basis_pytree
from .interior_edges_basis import InteriorEdgesBasis


@register_basis_pytree
class Basis(AbstractBasis):
    """Lagrange basis over mesh cells: P1 (vertices), P2 (vertices +
    edge midpoints) or P3 (vertices + two oriented edge nodes + a
    barycenter/face bubble per cell/face)."""

    def _compute_dofs(self, mesh, element):
        if element.polynomial_order == 1:
            coords_4_global_dofs = mesh["vertices", "coordinates"]
            global_dofs_4_elements = mesh["cells", "vertices"]
            nodes_4_boundary_dofs = mesh["vertices", "markers"]

        elif element.polynomial_order == 2:
            # P2: vertex DOFs + one DOF per unique edge (at the midpoint).
            verts = np.asarray(mesh["vertices", "coordinates"])
            cells = np.asarray(mesh["cells", "vertices"])
            edges = np.asarray(mesh["edges", "vertices"])
            edge_markers = np.asarray(mesh["edges", "markers"]).reshape(-1)
            vert_markers = np.asarray(mesh["vertices", "markers"]).reshape(-1)
            n_vertices = verts.shape[0]

            # map each cell's local edges to the mesh's unique-edge ids
            # (shared helper: topology.unique_edge_ids fixes the local
            # order and the lookup in one place)
            from ..mesh.topology import (
                p2_edge_dirichlet_markers,
                unique_edge_ids,
            )

            edge_markers = p2_edge_dirichlet_markers(
                edges, edge_markers, vert_markers
            )
            cell_edges = unique_edge_ids(cells, edges, n_vertices)

            midpoints = verts[edges].mean(axis=1)
            coords_4_global_dofs = jnp.asarray(
                np.concatenate([verts, midpoints], axis=0),
                dtype=config.default_dtype(),
            )
            global_dofs_4_elements = jnp.asarray(
                np.concatenate([cells, cell_edges + n_vertices], axis=1),
                dtype=config.index_dtype(),
            )
            nodes_4_boundary_dofs = jnp.asarray(
                np.concatenate([vert_markers, edge_markers], axis=0).reshape(-1, 1),
                dtype=config.index_dtype(),
            )
        elif element.polynomial_order == 3:
            # P3: vertex DOFs + TWO DOFs per unique edge (at 1/3 and 2/3,
            # globally oriented toward the smaller-endpoint vertex so
            # adjacent cells share them) + one orientation-free interior
            # node per "bubble entity" (triangles: the cell barycenter;
            # tets: each face barycenter). Local slot order matches
            # element_tri.py / element_tet.py: per local edge (i, j) the
            # near-i node first, then the bubble slots.
            from ..mesh.topology import (
                TET_EDGE_PERMUTATIONS,
                TET_FACE_PERMUTATIONS,
                p2_edge_dirichlet_markers,
                unique_edge_ids,
            )

            verts = np.asarray(mesh["vertices", "coordinates"])
            cells = np.asarray(mesh["cells", "vertices"])
            edges = np.asarray(mesh["edges", "vertices"])
            vert_markers = np.asarray(mesh["vertices", "markers"]).reshape(-1)
            edge_markers = p2_edge_dirichlet_markers(
                edges, mesh["edges", "markers"], vert_markers
            )
            n_vertices = verts.shape[0]
            n_edges = edges.shape[0]
            n_cells = cells.shape[0]
            is_tet = cells.shape[-1] == 4

            # (T, n_e_loc) unique-edge ids in the element's local order
            cell_edges = unique_edge_ids(cells, edges, n_vertices)

            # direction: does the local edge run small->large global id?
            if is_tet:
                directed = cells[:, TET_EDGE_PERMUTATIONS]
            else:
                directed = cells[:, [[0, 1], [1, 2], [2, 0]]]
            forward = directed[..., 0] < directed[..., 1]  # (T, n_e_loc)
            # unique edge e owns DOFs n_v + 2e (nearer min endpoint) and
            # n_v + 2e + 1 (nearer max endpoint); local slot near-i gets
            # the one nearer vertex i
            near_i = n_vertices + 2 * cell_edges + np.where(forward, 0, 1)
            near_j = n_vertices + 2 * cell_edges + np.where(forward, 1, 0)
            edge_dofs = np.stack([near_i, near_j], axis=-1).reshape(
                n_cells, -1
            )

            if is_tet:
                # bubble entities = unique faces, matched by scalar codes
                # (same encoding/guard regime as build_tet_topology)
                if n_vertices**3 >= 2**62:  # pragma: no cover
                    raise NotImplementedError(
                        "P3 tet face matching overflows the scalar face "
                        "code above ~1.6M vertices"
                    )
                faces = np.asarray(mesh["faces", "vertices"])  # sorted rows
                face_markers_tbl = np.asarray(
                    mesh["faces", "markers"]
                ).reshape(-1)
                fcodes = (
                    faces[:, 0].astype(np.int64) * n_vertices + faces[:, 1]
                ) * n_vertices + faces[:, 2]
                forder = np.argsort(fcodes)
                local_faces = np.sort(
                    cells[:, TET_FACE_PERMUTATIONS], axis=-1
                ).reshape(-1, 3)
                lcodes = (
                    local_faces[:, 0].astype(np.int64) * n_vertices
                    + local_faces[:, 1]
                ) * n_vertices + local_faces[:, 2]
                cell_faces = forder[
                    np.searchsorted(fcodes[forder], lcodes)
                ].reshape(n_cells, 4)
                bubble_dofs = n_vertices + 2 * n_edges + cell_faces
                bubble_coords = verts[faces].mean(axis=1)
                fm = vert_markers[faces]
                bubble_markers = np.where(
                    (face_markers_tbl != 0) & (fm != 0).all(axis=1),
                    fm.max(axis=1),
                    0,
                ).astype(np.int64)
            else:
                bubble_dofs = (
                    n_vertices + 2 * n_edges + np.arange(n_cells)
                )[:, None]
                bubble_coords = verts[cells].mean(axis=1)
                bubble_markers = np.zeros(n_cells, dtype=np.int64)

            global_dofs_4_elements = jnp.asarray(
                np.concatenate([cells, edge_dofs, bubble_dofs], axis=1),
                dtype=config.index_dtype(),
            )

            emin = verts[edges.min(axis=1)]
            emax = verts[edges.max(axis=1)]
            edge_nodes = np.stack(
                [(2 * emin + emax) / 3.0, (emin + 2 * emax) / 3.0], axis=1
            ).reshape(2 * n_edges, -1)
            coords_4_global_dofs = jnp.asarray(
                np.concatenate([verts, edge_nodes, bubble_coords], axis=0),
                dtype=config.default_dtype(),
            )
            nodes_4_boundary_dofs = jnp.asarray(
                np.concatenate(
                    [
                        vert_markers,
                        np.repeat(edge_markers, 2),
                        bubble_markers,
                    ]
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

    def _compute_jacobian_map(self, mesh, element):
        return jnp.matrix_transpose(self._cell_coordinates(mesh)) @ (
            element.barycentric_grad
        )

    def _locate_cells(self, points: np.ndarray, tol: float) -> np.ndarray:
        """Host-side point location: containing-cell id per query point.

        kd-tree over cell centroids, barycentric inside-test over the
        nearest candidates (widening 8 -> 64 -> all cells). Raises for
        points outside the mesh (beyond ``tol`` in barycentric terms).
        """
        coords = np.asarray(self.mesh["cells", "coordinates"])  # (T, k, d)
        n_cells, k, d = coords.shape
        if k != d + 1:
            raise NotImplementedError(
                "probe needs a flat simplex mesh (dim == ambient dim); "
                "embedded fracture bases are not supported"
            )
        pts = np.asarray(points, dtype=np.float64).reshape(-1, d)
        from scipy.spatial import cKDTree

        tree = cKDTree(coords.mean(axis=1))
        found = np.full(pts.shape[0], -1, dtype=np.int64)
        # barycentric via the affine system [1; x] = [[1..1]; V^T] lam
        a_mat = np.concatenate(
            [np.ones((n_cells, 1, k)), coords.transpose(0, 2, 1)], axis=1
        )  # (T, k, k)

        def _try(miss, cand):
            # candidate batches are capped so the (M, kk, k, k) solve stays
            # bounded (the all-cells fallback would otherwise materialize
            # M * n_cells * k * k floats)
            kk = cand.shape[1]
            rhs = np.concatenate(
                [np.ones((miss.size, 1)), pts[miss]], axis=1
            )  # (M, k)
            lam = np.linalg.solve(
                a_mat[cand], rhs[:, None, :, None]
            )  # (M, kk, k, 1)
            inside = (lam[..., 0] >= -tol).all(axis=-1)  # (M, kk)
            hit = inside.any(axis=1)
            first = inside.argmax(axis=1)
            found[miss[hit]] = cand[np.arange(miss.size), first][hit]

        for k_try in (8, 64):
            miss = np.flatnonzero(found < 0)
            if miss.size == 0:
                break
            kk = min(k_try, n_cells)
            _, cand = tree.query(pts[miss], k=kk)
            _try(miss, cand.reshape(miss.size, kk))
        # last resort: brute force the remaining points one at a time over
        # cell chunks (memory stays O(chunk * k * k))
        chunk = 1 << 16
        for p_idx in np.flatnonzero(found < 0):
            for start in range(0, n_cells, chunk):
                _try(
                    np.asarray([p_idx]),
                    np.arange(start, min(start + chunk, n_cells))[None, :],
                )
                if found[p_idx] >= 0:
                    break
        if (found < 0).any():
            bad = pts[np.flatnonzero(found < 0)[0]]
            raise ValueError(
                f"probe point outside the mesh (first offender: {bad})"
            )
        return found

    def probe(self, points, tensor, tol: float = 1e-10):
        """Evaluate a DOF vector at arbitrary physical points.

        The reference can only evaluate at quadrature points
        (``interpolate``); this adds scattered point evaluation: host-side
        point location (kd-tree + barycentric inside-test), then the same
        inverse-affine-map + shape-function machinery the edge traces use.

        Args:
          points: (P, d) physical coordinates inside the mesh.
          tensor: (n_dofs, 1) DOF vector (e.g. a solve result).
          tol: barycentric tolerance for the inside test.

        Returns ``(values, grads)`` with shapes ``(P,)`` and ``(P, d)``
        for scalar bases, ``(P, nc)`` and ``(P, nc, d)`` for vector bases.
        """
        d = int(self.mesh["vertices", "coordinates"].shape[-1])
        pts = np.asarray(points, dtype=np.float64).reshape(-1, d)
        cells = self._locate_cells(pts, tol)
        pts_j = jnp.asarray(pts, dtype=config.default_dtype())

        first_vertex = self.mesh["cells", "coordinates"][cells][
            :, None, [0], :
        ]  # (P, 1, 1, d)
        inv_jac = self._inv_map_jacobian[cells]  # (P, 1, d, d)
        ref = self._element.compute_inverse_map(
            first_vertex, pts_j[:, None, None, :], inv_jac
        )  # (P, 1, 1, d)
        bar = self._element.compute_barycentric_coordinates(
            ref.squeeze(-2)
        )  # (P, 1, n_bar, 1)
        v, v_grad = self._element.compute_shape_functions(bar, inv_jac)
        dof_vals = tensor[self._global_dofs4elements[cells]][
            :, None
        ]  # (P, 1, n_loc[*nc], 1)
        nc = int(getattr(self, "n_components", 1))
        if nc >= 2:
            # lift the scalar shape tables to the vector layout exactly as
            # VectorBasis.__init__ does (phi_l e_c, interleaved)
            eye = jnp.eye(nc, dtype=v.dtype)
            p_n, one, n_loc, _ = v.shape
            v = jnp.einsum("polu,cC->polcC", v, eye).reshape(
                p_n, one, n_loc * nc, nc
            )
            d = v_grad.shape[-1]
            v_grad = jnp.einsum(
                "pold,cC->polcCd", v_grad, eye.astype(v_grad.dtype)
            ).reshape(p_n, one, n_loc * nc, nc, d)
            values = (dof_vals * v).sum(-2)[:, 0]  # (P, nc)
            grads = (dof_vals[..., None] * v_grad).sum(-3)[:, 0]  # (P,nc,d)
        else:
            values = (dof_vals * v).sum(-2)[:, 0, 0]  # (P,)
            grads = (dof_vals * v_grad).sum(-2)[:, 0]  # (P, d)
        return values, grads

    def _cell_coordinates(self, mesh):
        return mesh["cells", "coordinates"]

    def _interp_cell_coordinates(self):
        """Cell coordinates in the space interpolation targets live in
        (overridden to 3D by embedded-surface bases)."""
        return self.mesh["cells", "coordinates"]

    def _compute_integration_points(self, mesh, bar_coords):
        return jnp.matrix_transpose(bar_coords) @ self._cell_coordinates(mesh)[
            ..., None, :, :
        ]

    # -- interpolation -----------------------------------------------------

    def interpolate(
        self, basis: AbstractBasis, tensor: Optional[jnp.ndarray] = None
    ):
        """Evaluate a DOF vector (or nodal samples of a function) on another
        basis's quadrature points.

        * ``basis is self``: per-cell evaluation, returns values/gradients at
          this basis's own quadrature points.
        * ``basis`` is an :class:`InteriorEdgesBasis`: two-sided traces — edge
          quadrature points are pulled back into each adjacent cell's
          reference coordinates, shape functions re-evaluated there, yielding
          a leading cell-pair axis at dim -4 (for jump terms).
        * ``basis`` is a :class:`BoundaryEdgesBasis`: one-sided traces — same
          machinery through the single adjacent cell, the side axis at dim -4
          has size 1 (for boundary-flux evaluation, e.g. du/dn on Neumann
          edges).

        Parity: reference basis.py:98-177.
        """
        if basis is self:
            dof_idx = self._global_dofs4elements[..., None, :]  # (T, 1, n_loc)
            v = self.v
            v_grad = self.v_grad

        elif isinstance(basis, InteriorEdgesBasis):
            # (E, n_sides): 2 cells per interior edge, 1 per boundary edge
            cells_4_interior_edges = basis._adjacent_cells()

            # (Ei, 2, 1, n_loc): DOF ids of both adjacent cells
            dof_idx = self._global_dofs4elements[cells_4_interior_edges][..., None, :]

            # (Ei, 2, 1, 1, d): first vertex of each adjacent cell
            first_vertex = self._interp_cell_coordinates()[..., [0], :][
                cells_4_interior_edges
            ][..., None, :, :]

            # (Ei, 2, 1, d, d)
            inv_map_jacobian = self._inv_map_jacobian[cells_4_interior_edges]

            # edge quadrature points with an inserted cell-pair axis:
            # (Ei, 1, q_E, 1, d)
            pts = basis.integration_points[..., None, :, :, :]

            ref_pts = self._element.compute_inverse_map(
                first_vertex, pts, inv_map_jacobian
            )  # (Ei, 2, q_E, 1, d_ref)

            bar_coords = self._element.compute_barycentric_coordinates(
                ref_pts.squeeze(-2)
            )  # (Ei, 2, q_E, n_loc, 1)

            v, v_grad = self._element.compute_shape_functions(
                bar_coords, inv_map_jacobian
            )
        else:
            raise NotImplementedError("Interpolation for this basis not implemented")

        if tensor is not None:
            values = tensor[dof_idx]  # (..., 1|q, n_loc, 1)
            interpolation = (values * v).sum(-2, keepdims=True)
            interpolation_grad = (values * v_grad).sum(-2, keepdims=True)
            return interpolation, interpolation_grad

        nodes = self._coords4global_dofs

        def interpolator(function: Callable[[jnp.ndarray], jnp.ndarray]):
            return (function(nodes)[dof_idx] * v).sum(-2, keepdims=True)

        def interpolator_grad(function: Callable[[jnp.ndarray], jnp.ndarray]):
            return (function(nodes)[dof_idx] * v_grad).sum(-2, keepdims=True)

        return interpolator, interpolator_grad
