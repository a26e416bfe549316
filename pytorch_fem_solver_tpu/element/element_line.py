"""P1 Lagrange segment reference element on [-1, 1].

Parity with ``torch_fem/element/element_line.py``: used for quadrature over
interior edges (jump/flux terms). The map Jacobian of an edge embedded in
R^d is a (d, 1) column; its "determinant" is the column norm (half-length
scale) and the pseudo-inverse is the reciprocal of that norm.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from .abstract_element import AbstractElement
from .quadrature import line_rule


class ElementLine(AbstractElement):
    """Reference segment [-1, 1] with P1 shape functions."""

    @property
    def barycentric_grad(self):
        # grad of ((1-x)/2, (1+x)/2) on [-1, 1]
        return jnp.asarray([[-0.5], [0.5]], dtype=config.default_dtype())

    @property
    def reference_element_area(self) -> float:
        return 2.0

    def compute_barycentric_coordinates(self, x):
        """(..., n_pts, 1) reference coords -> (..., n_pts, 2, 1) barycentric.

        Unlike the reference (element_line.py:18-19, which returns (q, 2) and
        only happens to work for 2-point symmetric rules), the layout matches
        the triangle convention (points, n_loc, 1) so every quadrature order
        works uniformly.
        """
        return jnp.stack([0.5 * (1.0 - x), 0.5 * (1.0 + x)], axis=-2)

    def compute_shape_functions(self, bar_coords, inv_map_jacobian):
        if self.polynomial_order == 1:
            v = bar_coords
            v_grad = self.barycentric_grad @ inv_map_jacobian
            return v, v_grad

        if self.polynomial_order == 2:
            # quadratic Lagrange in barycentric form, local DOF order
            # (endpoint 0, endpoint 1, midpoint) — mirrors ElementTri's P2
            # (element_tri.py) so facet bases can append the midpoint DOF
            # after the vertex DOFs
            l1 = bar_coords[..., 0, :][..., None, :]
            l2 = bar_coords[..., 1, :][..., None, :]
            v = jnp.concatenate(
                [l1 * (2 * l1 - 1), l2 * (2 * l2 - 1), 4 * l1 * l2],
                axis=-2,
            )
            g = self.barycentric_grad  # (2, 1)
            g1, g2 = g[0:1, :], g[1:2, :]
            grad_ref = jnp.concatenate(
                [
                    (4 * l1 - 1) * g1,
                    (4 * l2 - 1) * g2,
                    4 * (l2 * g1 + l1 * g2),
                ],
                axis=-2,
            )
            v_grad = grad_ref @ inv_map_jacobian
            return v, v_grad

        if self.polynomial_order == 3:
            # cubic Lagrange on the segment, local DOF order (endpoint 0,
            # endpoint 1, node at 2/3 toward endpoint 0, node at 2/3
            # toward endpoint 1) — mirrors the cell P3 edge-slot order so
            # facet bases can append the edge's two oriented global DOFs
            l1 = bar_coords[..., 0, :][..., None, :]
            l2 = bar_coords[..., 1, :][..., None, :]
            v = jnp.concatenate(
                [
                    0.5 * l1 * (3 * l1 - 1) * (3 * l1 - 2),
                    0.5 * l2 * (3 * l2 - 1) * (3 * l2 - 2),
                    4.5 * l1 * l2 * (3 * l1 - 1),
                    4.5 * l1 * l2 * (3 * l2 - 1),
                ],
                axis=-2,
            )
            g = self.barycentric_grad  # (2, 1)
            g1, g2 = g[0:1, :], g[1:2, :]
            grad_ref = jnp.concatenate(
                [
                    (13.5 * l1 * l1 - 9.0 * l1 + 1.0) * g1,
                    (13.5 * l2 * l2 - 9.0 * l2 + 1.0) * g2,
                    4.5 * (l2 * (6 * l1 - 1) * g1 + l1 * (3 * l1 - 1) * g2),
                    4.5 * (l1 * (6 * l2 - 1) * g2 + l2 * (3 * l2 - 1) * g1),
                ],
                axis=-2,
            )
            v_grad = grad_ref @ inv_map_jacobian
            return v, v_grad

        raise NotImplementedError("Polynomial order not implemented")

    def _compute_gauss_values(self):
        return line_rule(self.integration_order)

    def compute_det_and_inv_map(self, map_jacobian):
        """Norm of the (d, 1) edge Jacobian column and its reciprocal.

        det (..., 1, 1, 1) for quadrature-weight broadcasting,
        inv (..., 1, 1, 1) with the quadrature broadcast axis (matching the
        triangle element's (..., 1, d, d) layout).
        """
        det = jnp.linalg.norm(map_jacobian, axis=-2, keepdims=True)
        inv = 1.0 / det
        return det[..., None], inv[..., None]
