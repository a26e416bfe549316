"""Reference-element correctness: quadrature exactness, shape functions, maps.

Mirrors the reference test doctrine (SURVEY.md §4) with analytic oracles:
polynomial exactness of each quadrature rule, partition of unity, and the
affine-map algebra against closed forms.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_fem_solver_tpu.element import ElementLine, ElementTri
from pytorch_fem_solver_tpu.element.quadrature import (
    LINE_RULE_ORDERS,
    TRI_RULE_ORDERS,
    line_rule,
    triangle_rule,
)


def exact_tri_monomial(p, q):
    """Integral of x^p y^q over the reference triangle."""
    return math.factorial(p) * math.factorial(q) / math.factorial(p + q + 2)


@pytest.mark.parametrize("order", TRI_RULE_ORDERS)
def test_triangle_rule_polynomial_exactness(order):
    nodes, weights = triangle_rule(order)
    assert abs(weights.sum() - 1.0) < 1e-14
    for p in range(order + 1):
        for q in range(order + 1 - p):
            approx = 0.5 * (weights * nodes[:, 0] ** p * nodes[:, 1] ** q).sum()
            assert abs(approx - exact_tri_monomial(p, q)) < 1e-12, (p, q)


@pytest.mark.parametrize("order", LINE_RULE_ORDERS)
def test_line_rule_polynomial_exactness(order):
    nodes, weights = line_rule(order)
    assert abs(weights.sum() - 1.0) < 1e-14
    # order-k Gauss label in the reference maps to 2k-1 exactness for k>=2
    degree = 1 if order == 1 else 2 * order - 1
    for p in range(degree + 1):
        approx = 2.0 * (weights * nodes[:, 0] ** p).sum()
        exact = (1 - (-1) ** (p + 1)) / (p + 1)
        assert abs(approx - exact) < 1e-12, p


@pytest.mark.parametrize("poly_order", [1, 2])
def test_tri_partition_of_unity(poly_order):
    elem = ElementTri(poly_order, 4)
    bar = elem.compute_barycentric_coordinates(elem.gaussian_nodes)
    identity_inv = jnp.eye(2)[None, None]
    v, v_grad = elem.compute_shape_functions(bar, identity_inv)
    np.testing.assert_allclose(np.asarray(v.sum(-2)), 1.0, atol=1e-14)
    np.testing.assert_allclose(np.asarray(v_grad.sum(-2)), 0.0, atol=1e-13)


def test_tri_p1_nodal_property():
    elem = ElementTri(1, 1)
    corners = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    bar = elem.compute_barycentric_coordinates(corners)
    v, _ = elem.compute_shape_functions(bar, jnp.eye(2)[None, None])
    np.testing.assert_allclose(np.asarray(v[..., 0]), np.eye(3), atol=1e-15)


def test_tri_p2_nodal_property():
    elem = ElementTri(2, 2)
    nodes = jnp.asarray(
        [
            [0.0, 0.0],
            [1.0, 0.0],
            [0.0, 1.0],
            [0.5, 0.0],
            [0.5, 0.5],
            [0.0, 0.5],
        ]
    )
    bar = elem.compute_barycentric_coordinates(nodes)
    v, _ = elem.compute_shape_functions(bar, jnp.eye(2)[None, None])
    np.testing.assert_allclose(np.asarray(v[..., 0]), np.eye(6), atol=1e-14)


def test_det_and_inv_map():
    elem = ElementTri(1, 1)
    jac = jnp.asarray([[[2.0, 1.0], [0.5, 3.0]]])
    det, inv = elem.compute_det_and_inv_map(jac)
    np.testing.assert_allclose(float(det.reshape(())), 2 * 3 - 1 * 0.5)
    recon = jac @ inv[:, 0]
    np.testing.assert_allclose(np.asarray(recon[0]), np.eye(2), atol=1e-14)


def test_inverse_map_roundtrip():
    elem = ElementTri(1, 2)
    coords = jnp.asarray([[[0.2, 0.1], [1.3, 0.4], [0.5, 1.7]]])  # (1, 3, 2)
    jac = jnp.matrix_transpose(coords) @ elem.barycentric_grad
    _, inv = elem.compute_det_and_inv_map(jac)
    ref_pts = jnp.asarray([[0.25, 0.25], [0.1, 0.6]])
    bar = elem.compute_barycentric_coordinates(ref_pts)
    phys = jnp.matrix_transpose(bar) @ coords[:, None]
    back = elem.compute_inverse_map(coords[:, None, [0], :], phys, inv)
    np.testing.assert_allclose(
        np.asarray(back).reshape(-1, 2),
        np.broadcast_to(np.asarray(ref_pts), (2, 2)),
        atol=1e-13,
    )


def test_line_element_shapes():
    elem = ElementLine(1, 3)
    bar = elem.compute_barycentric_coordinates(elem.gaussian_nodes)
    assert bar.shape == (3, 2, 1)
    np.testing.assert_allclose(np.asarray(bar.sum(-2)), 1.0, atol=1e-15)
    # length of a straight segment from the quadrature machinery
    coords = jnp.asarray([[[0.0, 0.0], [3.0, 4.0]]])  # length 5
    jac = jnp.matrix_transpose(coords) @ elem.barycentric_grad
    det, inv = elem.compute_det_and_inv_map(jac)
    # dx = ref_length * w * det sums to the segment length
    dx = elem.reference_element_area * elem.gaussian_weights * det
    np.testing.assert_allclose(float(dx.sum()), 5.0, atol=1e-14)
