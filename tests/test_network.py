"""NN derivative correctness vs central finite differences.

Port of the reference doctrine in tests/test_derivate_wrt_inputs.py:17-105
(atol 1e-8 at float64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_fem_solver_tpu import FeedForwardNeuralNetwork


def bc_modifier(inputs):
    x = inputs[..., 0:1]
    y = inputs[..., 1:2]
    return x * (x - 1) * y * (y - 1)


@pytest.fixture(scope="module")
def nn():
    return FeedForwardNeuralNetwork(
        input_dimension=2,
        output_dimension=1,
        nb_hidden_layers=3,
        neurons_per_layers=10,
        boundary_condition_modifier=bc_modifier,
        seed=3,
    )


@pytest.fixture(scope="module")
def points():
    rng = np.random.default_rng(7)
    return jnp.asarray(rng.uniform(0.05, 0.95, size=(50, 2)))


def test_gradient_vs_finite_differences(nn, points):
    grad = np.asarray(nn.gradient(points))
    eps = 1e-6
    for i in range(2):
        shift = np.zeros((1, 2))
        shift[0, i] = eps
        fplus = np.asarray(nn(points + shift))
        fminus = np.asarray(nn(points - shift))
        fd = (fplus - fminus) / (2 * eps)
        np.testing.assert_allclose(grad[:, i : i + 1], fd, atol=1e-8)


def test_laplacian_vs_finite_differences(nn, points):
    lap = np.asarray(nn.laplacian(points))
    eps = 1e-5
    fd = np.zeros_like(lap)
    f0 = np.asarray(nn(points))
    for i in range(2):
        shift = np.zeros((1, 2))
        shift[0, i] = eps
        fplus = np.asarray(nn(points + shift))
        fminus = np.asarray(nn(points - shift))
        fd += (fplus - 2 * f0 + fminus) / eps**2
    np.testing.assert_allclose(lap, fd, atol=1e-5)


def test_boundary_condition_exact(nn):
    edge_points = jnp.asarray(
        [[0.0, 0.3], [1.0, 0.7], [0.4, 0.0], [0.9, 1.0]]
    )
    np.testing.assert_allclose(np.asarray(nn(edge_points)), 0.0, atol=1e-15)


def test_broadcast_shapes(nn):
    x = jnp.zeros((4, 6, 1, 2)) + 0.3
    assert nn(x).shape == (4, 6, 1, 1)
    assert nn.gradient(x).shape == (4, 6, 1, 2)
    assert nn.laplacian(x).shape == (4, 6, 1, 1)


def test_gradient_is_differentiable(nn, points):
    """Double backward (VPINN requirement): grad of a loss built on nn.gradient."""

    def loss(net):
        g = net.gradient(points)
        return jnp.sum(g**2)

    grads = jax.grad(loss)(nn)
    flat, _ = jax.tree_util.tree_flatten(grads)
    total = sum(float(jnp.abs(g).sum()) for g in flat)
    assert np.isfinite(total) and total > 0


def test_pytree_roundtrip(nn, points):
    leaves, treedef = jax.tree_util.tree_flatten(nn)
    nn2 = jax.tree_util.tree_unflatten(treedef, leaves)
    np.testing.assert_array_equal(np.asarray(nn(points)), np.asarray(nn2(points)))


def test_jit_through_module(nn, points):
    f = jax.jit(lambda net, x: net(x))
    np.testing.assert_allclose(
        np.asarray(f(nn, points)), np.asarray(nn(points)), atol=1e-15
    )

