"""P1/P2 Lagrange triangle reference element.

Capability parity with ``torch_fem/element/element_tri.py`` (reference):
P1 + P2 shape functions and gradients, symmetric Gauss rules of degree 1-5,
analytic 2x2 determinant/inverse for the affine map. All math is expressed as
broadcastable jnp ops so a single code path serves single meshes, batched
meshes (leading batch dim) and vmapped uses.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from .abstract_element import AbstractElement
from .quadrature import triangle_rule


class ElementTri(AbstractElement):
    """Reference triangle with vertices (0,0), (1,0), (0,1)."""

    @property
    def barycentric_grad(self):
        # grad of (1 - x - y, x, y) — rows are the 3 vertex basis fns
        return jnp.asarray(
            [[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]], dtype=config.default_dtype()
        )

    @property
    def reference_element_area(self) -> float:
        return 0.5

    @property
    def outward_normal(self):
        """Outward (unnormalized) edge normals of the reference triangle."""
        return jnp.asarray(
            [[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]], dtype=config.default_dtype()
        )

    def compute_barycentric_coordinates(self, x):
        """(..., n_pts, 2) reference coords -> (..., n_pts, 3, 1) barycentric."""
        lam1 = 1.0 - x[..., [0]] - x[..., [1]]
        return jnp.stack([lam1, x[..., [0]], x[..., [1]]], axis=-2)

    def compute_shape_functions(self, bar_coords, inv_map_jacobian):
        """Values (..., n_q, n_loc, 1) and physical gradients (..., 1|n_q, n_loc, 2)."""
        if self.polynomial_order == 1:
            v = bar_coords
            # constant gradient per cell: (3,2) @ (..., 2, 2) -> (..., 3, 2);
            # callers rely on broadcasting over the quadrature axis
            v_grad = self.barycentric_grad @ inv_map_jacobian
            return v, v_grad

        if self.polynomial_order == 2:
            l1, l2, l3 = (
                bar_coords[..., 0, :],
                bar_coords[..., 1, :],
                bar_coords[..., 2, :],
            )
            l1 = l1[..., None, :]
            l2 = l2[..., None, :]
            l3 = l3[..., None, :]
            v = jnp.concatenate(
                [
                    l1 * (2 * l1 - 1),
                    l2 * (2 * l2 - 1),
                    l3 * (2 * l3 - 1),
                    4 * l1 * l2,
                    4 * l2 * l3,
                    4 * l3 * l1,
                ],
                axis=-2,
            )
            g = self.barycentric_grad  # (3, 2)
            g1, g2, g3 = g[0:1, :], g[1:2, :], g[2:3, :]
            grad_ref = jnp.concatenate(
                [
                    (4 * l1 - 1) * g1,
                    (4 * l2 - 1) * g2,
                    (4 * l3 - 1) * g3,
                    4 * (l2 * g1 + l1 * g2),
                    4 * (l3 * g2 + l2 * g3),
                    4 * (l1 * g3 + l3 * g1),
                ],
                axis=-2,
            )
            v_grad = grad_ref @ inv_map_jacobian
            return v, v_grad

        if self.polynomial_order == 3:
            # cubic Lagrange, local DOF order: 3 vertices, then per local
            # edge (01, 12, 20) the two interior nodes ordered FROM the
            # first local vertex (at 2/3 then 1/3 of lambda_i), then the
            # barycenter bubble. Basis._compute_dofs orients the two edge
            # DOFs globally (nearer the smaller global vertex id first), so
            # adjacent cells agree on the shared nodes.
            l1 = bar_coords[..., 0, :][..., None, :]
            l2 = bar_coords[..., 1, :][..., None, :]
            l3 = bar_coords[..., 2, :][..., None, :]

            def vert(li):
                return 0.5 * li * (3 * li - 1) * (3 * li - 2)

            def edge(li, lj):
                # node at lambda_i = 2/3, lambda_j = 1/3
                return 4.5 * li * lj * (3 * li - 1)

            v = jnp.concatenate(
                [
                    vert(l1),
                    vert(l2),
                    vert(l3),
                    edge(l1, l2),
                    edge(l2, l1),
                    edge(l2, l3),
                    edge(l3, l2),
                    edge(l3, l1),
                    edge(l1, l3),
                    27.0 * l1 * l2 * l3,
                ],
                axis=-2,
            )
            g = self.barycentric_grad  # (3, 2)
            g1, g2, g3 = g[0:1, :], g[1:2, :], g[2:3, :]

            def dvert(li, gi):
                return (13.5 * li * li - 9.0 * li + 1.0) * gi

            def dedge(li, lj, gi, gj):
                return 4.5 * (
                    lj * (6 * li - 1) * gi + li * (3 * li - 1) * gj
                )

            grad_ref = jnp.concatenate(
                [
                    dvert(l1, g1),
                    dvert(l2, g2),
                    dvert(l3, g3),
                    dedge(l1, l2, g1, g2),
                    dedge(l2, l1, g2, g1),
                    dedge(l2, l3, g2, g3),
                    dedge(l3, l2, g3, g2),
                    dedge(l3, l1, g3, g1),
                    dedge(l1, l3, g1, g3),
                    27.0 * (l2 * l3 * g1 + l1 * l3 * g2 + l1 * l2 * g3),
                ],
                axis=-2,
            )
            v_grad = grad_ref @ inv_map_jacobian
            return v, v_grad

        raise NotImplementedError("Polynomial order not implemented")

    def _compute_gauss_values(self):
        return triangle_rule(self.integration_order)

    def compute_det_and_inv_map(self, map_jacobian):
        """Analytic 2x2 det and inverse of J (..., 2, 2).

        Returns both with an extra broadcast axis for the quadrature
        dimension, matching the reference layout (element_tri.py:132-145):
        det (..., 1, 1, 1), inv (..., 1, 2, 2). The broadcast axis lets
        per-cell constant gradients combine with per-quadrature tensors.
        """
        a = map_jacobian[..., 0, 0]
        b = map_jacobian[..., 0, 1]
        c = map_jacobian[..., 1, 0]
        d = map_jacobian[..., 1, 1]

        det = a * d - b * c
        inv = jnp.stack(
            [
                jnp.stack([d, -b], axis=-1),
                jnp.stack([-c, a], axis=-1),
            ],
            axis=-2,
        ) / det[..., None, None]

        det_map_jacobian = det[..., None, None, None]
        inv_map_jacobian = inv[..., None, :, :]
        return det_map_jacobian, inv_map_jacobian


class ElementTriSurface(ElementTri):
    """Reference triangle mapped into R^d (d >= 2): facet-quadrature element.

    Used by the 3D face bases (``InteriorFacesBasis``/``BoundaryFacesBasis``)
    the way ``ElementLine`` serves the 2D edge bases: the chart Jacobian J is
    a (d, 2) column pair, the integration measure is the Gram determinant
    ``sqrt(det(J^T J))`` (= |det J| when d = 2), and the "inverse" is the
    pseudo-inverse ``(J^T J)^{-1} J^T``, so the element's own shape-function
    gradients are *tangential* gradients expressed in ambient R^d
    coordinates. The 3D extension has no reference-library counterpart (the
    reference is 2D-only).
    """

    def compute_det_and_inv_map(self, map_jacobian):
        G = jnp.matrix_transpose(map_jacobian) @ map_jacobian  # (..., 2, 2)
        a = G[..., 0, 0]
        b = G[..., 0, 1]
        c = G[..., 1, 0]
        d = G[..., 1, 1]
        det_G = a * d - b * c
        det = jnp.sqrt(det_G)
        adj = jnp.stack(
            [jnp.stack([d, -b], axis=-1), jnp.stack([-c, a], axis=-1)],
            axis=-2,
        )
        pinv = (adj @ jnp.matrix_transpose(map_jacobian)) / det_G[
            ..., None, None
        ]
        return det[..., None, None, None], pinv[..., None, :, :]
