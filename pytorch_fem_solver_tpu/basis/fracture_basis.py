"""Basis over a glued discrete fracture network.

Parity target: reference ``FractureBasis``
(/root/reference/torch_fem/basis/fracture_basis.py). Pressure continuity
across fracture intersections (traces) is enforced purely by DOF
identification: 3D vertex coordinates are deduplicated across fractures into
a single global triangulation, and assembly scatters into global DOFs, so no
mortar/Lagrange machinery is needed.

TPU-native split: the dedup/glue (dynamic shapes: unique, nonzero) runs once
on the host in NumPy with tolerance-quantized coordinates — the reference
relies on exact float equality of mapped coordinates (fracture_basis.py:38-43),
which is fragile across separately-computed affine maps. Everything
downstream (integration, assembly, solve, interpolation) is static-shape
device compute.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .abstract_basis import AbstractBasis, register_basis_pytree
from .interior_edges_fracture_basis import InteriorEdgesFractureBasis


def _group_rows(coords: np.ndarray, tol: float):
    """(group_ids, counts) of coordinate rows equal within tolerance.

    Tolerance-robust (``mesh.dedup.tolerant_group``): an exact rounding grid
    would split one physical vertex whose float copies straddle a cell
    boundary, silently breaking trace continuity.
    """
    from ..mesh.dedup import tolerant_group

    scale = max(1.0, float(np.abs(coords).max()))
    ids = tolerant_group(coords, tol * scale)
    return ids, np.bincount(ids)


def build_global_triangulation(mesh, tol: float = 1e-9) -> dict:
    """Glue B fracture meshes into one global conforming triangulation.

    Host-side NumPy port of fracture_basis.py:28-129. Returns a dict of
    device arrays:
      vertices_3D (n_g, 3), vertices_2D (n_g, 2), vertex_markers (n_g,),
      triangles (B*T, 3), edges (E_g, 2), edge_markers (E_g,),
      global2local_idx (B*n_v,), local2global_idx (n_g,),
      traces_global_vertices_idx, traces_global_edges_idx,
      traces_local_edges_idx (B, K).
    """
    coords3d = np.asarray(mesh["vertices", "coordinates_3d"], dtype=np.float64)
    coords2d = np.asarray(mesh["vertices", "coordinates"], dtype=np.float64)
    markers = np.asarray(mesh["vertices", "markers"]).reshape(
        coords3d.shape[0], -1
    )
    cells = np.asarray(mesh["cells", "vertices"])
    edges = np.asarray(mesh["edges", "vertices"])

    nb_fractures, nb_vertices, _ = coords3d.shape
    nb_edges = edges.shape[-2]

    flat3d = coords3d.reshape(-1, 3)
    global2local_idx, vertex_counts = _group_rows(flat3d, tol)
    nb_global = vertex_counts.shape[0]

    # canonical (minimal) local flat index per global vertex
    local2global_idx = np.full(nb_global, flat3d.shape[0], dtype=np.int64)
    np.minimum.at(local2global_idx, global2local_idx, np.arange(flat3d.shape[0]))

    global_vertices_3d = flat3d[local2global_idx]
    global_vertices_2d = coords2d.reshape(-1, 2)[local2global_idx]

    traces_global_vertices_idx = np.nonzero(vertex_counts > 1)[0]

    # a global DOF is Dirichlet iff ANY local copy is marked boundary —
    # robust where the reference takes the arbitrary canonical copy's marker
    flat_markers = markers.reshape(-1)
    global_markers = np.zeros(nb_global, dtype=np.int64)
    np.maximum.at(global_markers, global2local_idx, flat_markers)

    vertex_offset = np.arange(nb_fractures)[:, None, None] * nb_vertices
    global_triangles = global2local_idx[cells + vertex_offset].reshape(-1, 3)

    local_edges_global = global2local_idx[edges + vertex_offset].reshape(-1, 2)
    local_edges_sorted = np.sort(local_edges_global, axis=-1)
    global_edges, global2local_edges_idx, edge_counts = np.unique(
        local_edges_sorted, axis=0, return_inverse=True, return_counts=True
    )
    nb_global_edges = global_edges.shape[0]

    traces_global_edges_idx = np.nonzero(edge_counts > 1)[0]
    trace_flat = np.nonzero(
        np.isin(global2local_edges_idx, traces_global_edges_idx)
    )[0]
    # per-fracture local indices of trace edges; general networks carry
    # unequal counts per fracture, so the table is padded with -1
    per_fracture = [
        trace_flat[(trace_flat >= b * nb_edges) & (trace_flat < (b + 1) * nb_edges)]
        - b * nb_edges
        for b in range(nb_fractures)
    ]
    k_max = max((len(p) for p in per_fracture), default=0)
    traces_local_edges_idx = np.full((nb_fractures, k_max), -1, dtype=np.int64)
    for b, p in enumerate(per_fracture):
        traces_local_edges_idx[b, : len(p)] = p

    # positions of trace edges inside each fracture's *interior-edge* list —
    # that is the axis jump tensors live on (the reference indexes jumps with
    # full-edge-list ids, example_fractures_fem.py:299-301, which only works
    # when the orderings happen to align); -1 where a trace edge is a
    # boundary edge of that fracture (no two-sided jump there)
    interior_vertices = np.asarray(mesh["interior_edges", "vertices"])
    traces_interior_edges_idx = np.full(
        (nb_fractures, k_max), -1, dtype=np.int64
    )
    for b in range(nb_fractures):
        lookup = {
            tuple(pair): pos
            for pos, pair in enumerate(np.sort(interior_vertices[b], axis=-1))
        }
        for k, local_edge in enumerate(per_fracture[b]):
            pair = tuple(np.sort(edges[b, local_edge]))
            traces_interior_edges_idx[b, k] = lookup.get(pair, -1)

    local2global_edges_idx = np.full(
        nb_global_edges, nb_fractures * nb_edges, dtype=np.int64
    )
    np.minimum.at(
        local2global_edges_idx,
        global2local_edges_idx,
        np.arange(nb_fractures * nb_edges),
    )

    edge_markers_flat = np.asarray(mesh["edges", "markers"]).reshape(-1)
    global_edge_markers = np.zeros(nb_global_edges, dtype=np.int64)
    np.maximum.at(global_edge_markers, global2local_edges_idx, edge_markers_flat)

    f = config.default_dtype()
    i = config.index_dtype()
    return {
        "vertices_3D": jnp.asarray(global_vertices_3d, dtype=f),
        "vertices_2D": jnp.asarray(global_vertices_2d, dtype=f),
        "vertex_markers": jnp.asarray(global_markers, dtype=i),
        "triangles": jnp.asarray(global_triangles, dtype=i),
        "edges": jnp.asarray(global_edges, dtype=i),
        "edge_markers": jnp.asarray(global_edge_markers, dtype=i),
        "global2local_idx": jnp.asarray(global2local_idx, dtype=i),
        "local2global_idx": jnp.asarray(local2global_idx, dtype=i),
        "traces_global_vertices_idx": jnp.asarray(
            traces_global_vertices_idx, dtype=i
        ),
        "traces_global_edges_idx": jnp.asarray(traces_global_edges_idx, dtype=i),
        "traces_local_edges_idx": jnp.asarray(traces_local_edges_idx, dtype=i),
        "traces_interior_edges_idx": jnp.asarray(
            traces_interior_edges_idx, dtype=i
        ),
    }


@register_basis_pytree
class FractureBasis(AbstractBasis):
    """P1/P2/P3 basis on the glued global DFN triangulation (the reference
    is P1-only, basis/fracture_basis.py)."""

    def __init__(self, mesh, element, tol: float = 1e-9):
        self.global_triangulation = build_global_triangulation(mesh, tol)
        self.nb_fractures = int(mesh.batch_size()[0])

        super().__init__(mesh, element)

        # correct 2D reference gradients to tangential 3D gradients:
        # (B, T, 1, n_loc, 2) @ (B, 1, 1, 2, 3) -> (B, T, 1, n_loc, 3)
        inv_frac = mesh["inv_jacobian_fracture_map"][:, None, None]
        self.v_grad = self.v_grad @ inv_frac
        self._inv_map_jacobian = self._inv_map_jacobian @ inv_frac

    # -- DOFs on the global triangulation ----------------------------------

    def _compute_dofs(self, mesh, element):
        g = self.global_triangulation

        if element.polynomial_order == 1:
            coords_4_global_dofs = g["vertices_3D"]
            global_dofs_4_elements = g["triangles"]  # (B*T, 3)
            nodes_4_boundary_dofs = g["vertex_markers"][:, None]

        elif element.polynomial_order == 2:
            # P2 on the glued triangulation (beyond the reference, whose P2
            # DOF map is commented out, basis.py:26-49): vertex DOFs + one
            # DOF per unique *global* edge. Trace edges carry the same
            # global vertex pair in every incident fracture, so midpoint
            # DOFs are shared and pressure continuity extends to P2 —
            # matching FractureNetworkBasis on the flat layout.
            gverts = np.asarray(g["vertices_3D"])
            gcells = np.asarray(g["triangles"])
            gedges = np.asarray(g["edges"])  # lexicographically sorted rows
            edge_markers = np.asarray(g["edge_markers"]).reshape(-1)
            vmark = np.asarray(g["vertex_markers"]).reshape(-1)
            n_gverts = gverts.shape[0]

            # unique-edge rows are sorted, so their codes are ascending and
            # searchsorted maps cell edges straight to global edge ids
            # (shared helpers in mesh.topology)
            from ..mesh.topology import encode_edge_pairs, p2_cell_edge_pairs

            local = p2_cell_edge_pairs(gcells)
            edge_codes = encode_edge_pairs(gedges, n_gverts)
            local_codes = encode_edge_pairs(local, n_gverts)
            cell_edges = np.searchsorted(edge_codes, local_codes)

            midpoints = gverts[gedges].mean(axis=1)
            # a midpoint is Dirichlet iff its edge is a boundary edge of at
            # least one incident fracture (edge_markers is the OR over
            # fractures) and both endpoints are marked
            edge_dirichlet = (
                (edge_markers != 0)
                & (vmark[gedges[:, 0]] != 0)
                & (vmark[gedges[:, 1]] != 0)
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
                np.concatenate([vmark, edge_dirichlet], axis=0).reshape(-1, 1),
                dtype=config.index_dtype(),
            )
        elif element.polynomial_order == 3:
            # P3 on the glued triangulation, reusing the oriented-edge
            # logic of the plain/flat-network builders (basis.py P3,
            # fracture_network_basis.py): two DOFs per unique GLOBAL edge,
            # ordered toward the smaller global vertex id — trace edges
            # carry the same global vertex pair in every incident fracture,
            # so both cubic edge nodes are shared and continuity glues.
            # Cell bubbles are per (fracture, cell), never shared.
            gverts = np.asarray(g["vertices_3D"])
            gcells = np.asarray(g["triangles"])
            gedges = np.asarray(g["edges"])  # lexicographically sorted rows
            edge_markers = np.asarray(g["edge_markers"]).reshape(-1)
            vmark = np.asarray(g["vertex_markers"]).reshape(-1)
            n_gverts = gverts.shape[0]
            n_gedges = gedges.shape[0]
            n_cells = gcells.shape[0]

            from ..mesh.topology import unique_edge_ids

            cell_edges = unique_edge_ids(gcells, gedges, n_gverts)
            directed = gcells[:, [[0, 1], [1, 2], [2, 0]]]
            forward = directed[..., 0] < directed[..., 1]
            near_i = n_gverts + 2 * cell_edges + np.where(forward, 0, 1)
            near_j = n_gverts + 2 * cell_edges + np.where(forward, 1, 0)
            edge_dofs = np.stack([near_i, near_j], axis=-1).reshape(
                n_cells, -1
            )
            bubble_dofs = (n_gverts + 2 * n_gedges + np.arange(n_cells))[
                :, None
            ]

            emin = gverts[gedges[:, 0]]
            emax = gverts[gedges[:, 1]]
            edge_nodes = np.stack(
                [(2 * emin + emax) / 3.0, (emin + 2 * emax) / 3.0], axis=1
            ).reshape(2 * n_gedges, -1)
            bubble_coords = gverts[gcells].mean(axis=1)

            edge_dirichlet = (
                (edge_markers != 0)
                & (vmark[gedges[:, 0]] != 0)
                & (vmark[gedges[:, 1]] != 0)
            ).astype(np.int64)

            coords_4_global_dofs = jnp.asarray(
                np.concatenate([gverts, edge_nodes, bubble_coords], axis=0),
                dtype=config.default_dtype(),
            )
            global_dofs_4_elements = jnp.asarray(
                np.concatenate([gcells, edge_dofs, bubble_dofs], axis=1),
                dtype=config.index_dtype(),
            )
            nodes_4_boundary_dofs = jnp.asarray(
                np.concatenate(
                    [
                        vmark,
                        np.repeat(edge_dirichlet, 2),
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

    def _compute_basis_parameters(
        self, coords4global_dofs, global_dofs4elements, nodes4boundary_dofs
    ):
        return self._build_assembly_parameters(
            int(coords4global_dofs.shape[-2]),
            global_dofs4elements,
            nodes4boundary_dofs,
        )

    # -- geometry -----------------------------------------------------------

    def _compute_jacobian_map(self, mesh, element):
        return jnp.matrix_transpose(mesh["cells", "coordinates"]) @ (
            element.barycentric_grad
        )

    def _compute_integration_points(self, mesh, bar_coords):
        # quadrature points directly in 3D via the lifted cell coordinates
        # (equivalent to map-then-lift, fracture_basis.py:199-207)
        return jnp.matrix_transpose(bar_coords) @ mesh["cells", "coordinates_3d"][
            ..., None, :, :
        ]

    def _compute_integral_weights(self, element, det_map_jacobian):
        # 2D reference measure x per-fracture area scale ||j1 x j2||
        scale = self.mesh["det_jacobian_fracture_map"][..., None, None]
        return (
            element.reference_element_area
            * element.gaussian_weights
            * det_map_jacobian
            * scale
        )

    # -- interpolation -------------------------------------------------------

    def interpolate(self, basis: AbstractBasis, tensor: Optional[jnp.ndarray] = None):
        """Evaluate a *global* DOF vector on this basis or on the fracture
        interior-edge basis (two-sided traces for flux jumps)."""
        B = self.nb_fractures

        if basis is self:
            n_loc = self._global_dofs4elements.shape[-1]
            dof_idx = self._global_dofs4elements.reshape(B, -1, 1, n_loc)
            v = self.v
            v_grad = self.v_grad

        elif isinstance(basis, InteriorEdgesFractureBasis):
            cells_4_ie = basis.mesh["interior_edges", "cells"]  # (B, Ei, 2)
            n_loc = self._global_dofs4elements.shape[-1]
            triangles = self._global_dofs4elements.reshape(B, -1, n_loc)

            gather = jax.vmap(lambda arr, idx: arr[idx])

            # (B, Ei, 2, 1, n_loc)
            dof_idx = gather(triangles, cells_4_ie)[..., None, :]

            first_vertex = gather(
                self.mesh["cells", "coordinates_3d"][..., :1, :], cells_4_ie
            )[..., None, :, :]  # (B, Ei, 2, 1, 1, 3)

            inv_map = gather(self._inv_map_jacobian, cells_4_ie)  # (B, Ei, 2, 1, 2, 3)

            pts = basis.integration_points[:, :, None]  # (B, Ei, 1, q, 1, 3)

            ref_pts = self._element.compute_inverse_map(
                first_vertex, pts, inv_map
            )  # (B, Ei, 2, q, 1, 2)

            bar_coords = self._element.compute_barycentric_coordinates(
                ref_pts.squeeze(-2)
            )  # (B, Ei, 2, q, n_loc, 1)

            v, v_grad = self._element.compute_shape_functions(bar_coords, inv_map)
        else:
            raise NotImplementedError(
                f"Interpolation to {type(basis).__name__} not implemented"
            )

        if tensor is not None:
            values = tensor[dof_idx]
            interpolation = (values * v).sum(-2, keepdims=True)
            interpolation_grad = (values * v_grad).sum(-2, keepdims=True)
            return interpolation, interpolation_grad

        def _global_nodal_values(function):
            # evaluate at the global DOF coordinates (vertices + P2 edge
            # midpoints); identical to sampling the canonical local copy —
            # canonical-copy coordinates ARE the global coordinates.
            # Force a trailing component axis: a scalar function returning
            # (N,) would otherwise broadcast its n_loc axis against the
            # trailing 1 of v/v_grad — a silent outer product.
            vals = function(self._coords4global_dofs)
            return vals.reshape(vals.shape[0], -1)

        def interpolator(function):
            return (_global_nodal_values(function)[dof_idx] * v).sum(
                -2, keepdims=True
            )

        def interpolator_grad(function):
            return (_global_nodal_values(function)[dof_idx] * v_grad).sum(
                -2, keepdims=True
            )

        return interpolator, interpolator_grad
