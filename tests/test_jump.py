"""Interior-edge interpolation and jump-estimator correctness.

The reference validates this machinery against scikit-fem's
InteriorFacetBasis (tests/test_jump.py:53-83); here the oracles are analytic:

* traces of a globally linear P1 function agree from both sides and its
  normal-gradient jump vanishes identically;
* the jump of a hat function's gradient across a given edge is computable
  in closed form from the two adjacent element gradients;
* edge functionals integrate exactly (total interior edge length).
"""

import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem


def make(n=4):
    mesh = fem.MeshTri(fem.unit_square(n=n))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    V_edges = fem.InteriorEdgesBasis(mesh, fem.ElementLine(1, 2))
    return mesh, V, V_edges


def test_edge_functional_total_length():
    mesh, V, V_edges = make(3)
    total = float(
        V_edges.integrate_functional(
            lambda b: jnp.ones_like(b.integration_points[..., 0:1])
        ).sum()
    )
    expect = float(np.asarray(mesh["interior_edges", "length"]).sum())
    assert abs(total - expect) < 1e-13


def test_two_sided_traces_of_linear_function():
    mesh, V, V_edges = make(4)
    coords = np.asarray(V._coords4global_dofs)
    u = jnp.asarray((2.0 * coords[:, 0] - 0.7 * coords[:, 1] + 0.3).reshape(-1, 1))

    interp, interp_grad = V.interpolate(V_edges, u)
    # values: both cell sides agree with the analytic function at edge
    # quadrature points
    pts = np.asarray(V_edges.integration_points)  # (Ei, q, 1, 2)
    exact_vals = 2.0 * pts[..., 0:1] - 0.7 * pts[..., 1:2] + 0.3
    vals = np.asarray(interp)  # (Ei, 2, q, 1, 1)
    for side in range(2):
        np.testing.assert_allclose(vals[:, side, :, 0, :], exact_vals[:, :, 0, :], atol=1e-12)

    # gradients: constant (2, -0.7) from both sides -> zero jump
    grads = np.asarray(interp_grad)  # (Ei, 2, 1, 1, 2)
    np.testing.assert_allclose(grads[..., 0], 2.0, atol=1e-12)
    np.testing.assert_allclose(grads[..., 1], -0.7, atol=1e-12)

    normals = V_edges.mesh["interior_edges", "normals"][..., None, :, :]
    gp, gm = jnp.asarray(grads)[:, 0], jnp.asarray(grads)[:, 1]
    jump = ((gp * normals).sum(-1) + (gm * -normals).sum(-1))
    np.testing.assert_allclose(np.asarray(jump), 0.0, atol=1e-12)


def test_normal_gradient_jump_closed_form():
    """Jump of one hat function across each edge vs direct per-cell formula."""
    mesh, V, V_edges = make(3)
    n_dofs = V.n_dofs
    rng = np.random.default_rng(5)
    u_np = rng.normal(size=(n_dofs, 1))
    u = jnp.asarray(u_np)

    _, interp_grad = V.interpolate(V_edges, u)
    grads = np.asarray(interp_grad)  # (Ei, 2, 1, 1, 2)
    normals = np.asarray(mesh["interior_edges", "normals"])  # (Ei, 1, 2)
    jump = (grads[:, 0, 0] * normals).sum(-1) - (grads[:, 1, 0] * normals).sum(-1)

    # direct oracle: per-cell P1 gradient from closed-form barycentric grads
    verts = np.asarray(mesh["vertices", "coordinates"])
    tris = np.asarray(mesh["cells", "vertices"])
    cell_grad = np.zeros((tris.shape[0], 2))
    for c, tri in enumerate(tris):
        p = verts[tri]
        J = np.stack([p[1] - p[0], p[2] - p[0]], axis=1)
        G = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]) @ np.linalg.inv(J)
        cell_grad[c] = (u_np[tri, 0][:, None] * G).sum(0)

    cells = np.asarray(mesh["interior_edges", "cells"])
    oracle = ((cell_grad[cells[:, 0]] - cell_grad[cells[:, 1]]) * normals[:, 0]).sum(-1)
    np.testing.assert_allclose(jump[:, 0], oracle, atol=1e-12)


def test_jump_estimator_functional_runs_and_backprops():
    """example_jump-style loss: finite value + nonzero NN parameter grads."""
    import jax

    mesh, V, V_edges = make(3)

    def bc(inputs):
        x, y = inputs[..., 0:1], inputs[..., 1:2]
        return x * (x - 1) * y * (y - 1)

    nn = fem.FeedForwardNeuralNetwork(2, 1, 2, 8, boundary_condition_modifier=bc)
    _, interp_to_edges_grad = V.interpolate(V_edges)

    h_E = V.mesh["interior_edges", "length"][..., None, :, :]
    n_E = V.mesh["interior_edges", "normals"][..., None, :, :]
    h_T = V.mesh["cells", "length"]

    def jump_term(_, normals, edge_size, net):
        g = interp_to_edges_grad(net)
        g_plus, g_minus = g[:, 0], g[:, 1]
        return (
            edge_size
            * (
                (g_plus * normals).sum(-1, keepdims=True)
                + (g_minus * -normals).sum(-1, keepdims=True)
            )
            ** 2
        )

    def bulk_term(basis, cell_size, net):
        pts = basis.integration_points
        x, y = pts[..., 0:1], pts[..., 1:2]
        rhs = 2.0 * jnp.pi**2 * jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)
        return cell_size**2 * (rhs + net.laplacian(pts)) ** 2

    def loss_fn(net):
        jump = V_edges.integrate_functional(jump_term, n_E, h_E, net).sum()
        bulk = V.integrate_functional(bulk_term, h_T, net).sum()
        return jump + bulk

    loss, grads = jax.value_and_grad(loss_fn)(nn)
    assert np.isfinite(float(loss)) and float(loss) > 0
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert sum(float(jnp.abs(g).sum()) for g in flat) > 0
