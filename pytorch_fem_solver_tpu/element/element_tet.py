"""P1/P2 Lagrange tetrahedron reference element.

3D extension beyond the 2D-only reference library (its element layer stops at
``torch_fem/element/element_tri.py``): same abstract surface as
:class:`ElementTri`, lifted one dimension — P1 + P2 shape functions and
gradients, symmetric Keast quadrature of degree 1-5, analytic 3x3
determinant/inverse (adjugate) for the affine map. All math is expressed as
broadcastable jnp ops so a single code path serves single meshes, batched
meshes and vmapped uses.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from .abstract_element import AbstractElement
from .quadrature import tetrahedron_rule


class ElementTet(AbstractElement):
    """Reference tetrahedron with vertices (0,0,0), (1,0,0), (0,1,0), (0,0,1)."""

    @property
    def barycentric_grad(self):
        # grad of (1 - x - y - z, x, y, z) — rows are the 4 vertex basis fns
        return jnp.asarray(
            [
                [-1.0, -1.0, -1.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
            ],
            dtype=config.default_dtype(),
        )

    @property
    def reference_element_area(self) -> float:
        return 1.0 / 6.0

    def compute_barycentric_coordinates(self, x):
        """(..., n_pts, 3) reference coords -> (..., n_pts, 4, 1) barycentric."""
        lam1 = 1.0 - x[..., [0]] - x[..., [1]] - x[..., [2]]
        return jnp.stack(
            [lam1, x[..., [0]], x[..., [1]], x[..., [2]]], axis=-2
        )

    def compute_shape_functions(self, bar_coords, inv_map_jacobian):
        """Values (..., n_q, n_loc, 1) and physical gradients (..., 1|n_q, n_loc, 3).

        P2 midpoint functions follow the local edge order
        (01, 12, 02, 03, 13, 23) — the tri convention (01, 12, 02) extended
        with the apex edges — matching
        ``mesh.topology.TET_EDGE_PERMUTATIONS`` and the P2 DOF builder.
        """
        if self.polynomial_order == 1:
            v = bar_coords
            # constant gradient per cell: (4,3) @ (..., 3, 3) -> (..., 4, 3)
            v_grad = self.barycentric_grad @ inv_map_jacobian
            return v, v_grad

        if self.polynomial_order == 2:
            lams = [bar_coords[..., i, :][..., None, :] for i in range(4)]
            g = self.barycentric_grad  # (4, 3)
            gs = [g[i : i + 1, :] for i in range(4)]
            edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3)]
            v = jnp.concatenate(
                [l * (2 * l - 1) for l in lams]
                + [4 * lams[a] * lams[b] for a, b in edges],
                axis=-2,
            )
            grad_ref = jnp.concatenate(
                [(4 * lams[i] - 1) * gs[i] for i in range(4)]
                + [4 * (lams[b] * gs[a] + lams[a] * gs[b]) for a, b in edges],
                axis=-2,
            )
            v_grad = grad_ref @ inv_map_jacobian
            return v, v_grad

        if self.polynomial_order == 3:
            # cubic Lagrange on the tet: 4 vertices, two nodes per edge
            # (TET_EDGE_PERMUTATIONS order, near-a then near-b — oriented
            # globally by Basis._compute_dofs), one barycenter node per
            # face (TET_FACE_PERMUTATIONS order; orientation-free). 20 DOFs.
            lams = [bar_coords[..., i, :][..., None, :] for i in range(4)]
            g = self.barycentric_grad  # (4, 3)
            gs = [g[i : i + 1, :] for i in range(4)]
            edges = [(0, 1), (1, 2), (0, 2), (0, 3), (1, 3), (2, 3)]
            faces = [(0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3)]

            def vert(l):
                return 0.5 * l * (3 * l - 1) * (3 * l - 2)

            def dvert(l, gi):
                return (13.5 * l * l - 9.0 * l + 1.0) * gi

            def edge(la, lb):
                return 4.5 * la * lb * (3 * la - 1)

            def dedge(la, lb, ga, gb):
                return 4.5 * (lb * (6 * la - 1) * ga + la * (3 * la - 1) * gb)

            v = jnp.concatenate(
                [vert(l) for l in lams]
                + [
                    f(a, b)
                    for a, b in edges
                    for f in (
                        lambda a, b: edge(lams[a], lams[b]),
                        lambda a, b: edge(lams[b], lams[a]),
                    )
                ]
                + [
                    27.0 * lams[i] * lams[j] * lams[k]
                    for i, j, k in faces
                ],
                axis=-2,
            )
            grad_ref = jnp.concatenate(
                [dvert(lams[i], gs[i]) for i in range(4)]
                + [
                    f(a, b)
                    for a, b in edges
                    for f in (
                        lambda a, b: dedge(lams[a], lams[b], gs[a], gs[b]),
                        lambda a, b: dedge(lams[b], lams[a], gs[b], gs[a]),
                    )
                ]
                + [
                    27.0
                    * (
                        lams[j] * lams[k] * gs[i]
                        + lams[i] * lams[k] * gs[j]
                        + lams[i] * lams[j] * gs[k]
                    )
                    for i, j, k in faces
                ],
                axis=-2,
            )
            v_grad = grad_ref @ inv_map_jacobian
            return v, v_grad

        raise NotImplementedError("Polynomial order not implemented")

    def _compute_gauss_values(self):
        return tetrahedron_rule(self.integration_order)

    def compute_det_and_inv_map(self, map_jacobian):
        """Analytic 3x3 det and inverse (adjugate) of J (..., 3, 3).

        Same broadcast-axis layout as :meth:`ElementTri.compute_det_and_inv_map`:
        det (..., 1, 1, 1), inv (..., 1, 3, 3).
        """
        a = map_jacobian[..., 0, 0]
        b = map_jacobian[..., 0, 1]
        c = map_jacobian[..., 0, 2]
        d = map_jacobian[..., 1, 0]
        e = map_jacobian[..., 1, 1]
        f = map_jacobian[..., 1, 2]
        g = map_jacobian[..., 2, 0]
        h = map_jacobian[..., 2, 1]
        i = map_jacobian[..., 2, 2]

        A = e * i - f * h
        B = f * g - d * i
        C = d * h - e * g
        det = a * A + b * B + c * C

        adj = jnp.stack(
            [
                jnp.stack([A, c * h - b * i, b * f - c * e], axis=-1),
                jnp.stack([B, a * i - c * g, c * d - a * f], axis=-1),
                jnp.stack([C, b * g - a * h, a * e - b * d], axis=-1),
            ],
            axis=-2,
        )
        inv = adj / det[..., None, None]

        det_map_jacobian = det[..., None, None, None]
        inv_map_jacobian = inv[..., None, :, :]
        return det_map_jacobian, inv_map_jacobian
