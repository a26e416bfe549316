"""Point evaluation (`Basis.probe`): DOF vectors at arbitrary points.

Beyond the reference (which evaluates only at quadrature points via
``interpolate``): kd-tree point location + the inverse-affine-map trace
machinery. Exact for in-space functions on P1-P3, in 2D and 3D, scalar
and vector.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube


def test_probe_p3_polynomial_exact_2d():
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.Basis(mesh, fem.ElementTri(3, 5))
    coords = np.asarray(V._coords4global_dofs)
    u = jnp.asarray((coords[:, 0] ** 3 + 2 * coords[:, 1] ** 2).reshape(-1, 1))
    pts = np.random.default_rng(1).random((50, 2))
    vals, grads = V.probe(pts, u)
    np.testing.assert_allclose(
        np.asarray(vals), pts[:, 0] ** 3 + 2 * pts[:, 1] ** 2, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(grads),
        np.stack([3 * pts[:, 0] ** 2, 4 * pts[:, 1]], axis=1),
        atol=1e-11,
    )


def test_probe_3d_and_boundary_points():
    mesh = MeshTet(unit_cube(2))
    V = fem.Basis(mesh, ElementTet(1, 2))
    c = np.asarray(V._coords4global_dofs)
    u = jnp.asarray((1 + 2 * c[:, 0] - c[:, 1] + 3 * c[:, 2]).reshape(-1, 1))
    rng = np.random.default_rng(2)
    pts = np.concatenate(
        [
            rng.random((30, 3)),
            [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [0.5, 0.0, 1.0]],  # corners/edges
        ]
    )
    vals, grads = V.probe(pts, u)
    np.testing.assert_allclose(
        np.asarray(vals),
        1 + 2 * pts[:, 0] - pts[:, 1] + 3 * pts[:, 2],
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(grads), np.tile([2.0, -1.0, 3.0], (pts.shape[0], 1)),
        atol=1e-12,
    )


def test_probe_vector_basis():
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    cv = np.asarray(V._coords4global_dofs)
    comp = np.arange(cv.shape[0]) % 2
    u = jnp.asarray(
        np.where(comp == 0, 1 + cv[:, 0], 2 * cv[:, 1]).reshape(-1, 1)
    )
    pts = np.random.default_rng(3).random((20, 2))
    vals, grads = V.probe(pts, u)
    assert vals.shape == (20, 2) and grads.shape == (20, 2, 2)
    np.testing.assert_allclose(
        np.asarray(vals),
        np.stack([1 + pts[:, 0], 2 * pts[:, 1]], axis=1),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(grads),
        np.tile(np.array([[1.0, 0.0], [0.0, 2.0]]), (20, 1, 1)),
        atol=1e-12,
    )


def test_probe_outside_raises_and_solution_roundtrip():
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**6))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    a = lambda b_: b_.v_grad @ jnp.matrix_transpose(b_.v_grad)
    u = V.solve_iterative(
        V.integrate_bilinear_form_local(a),
        V.integrate_linear_form(lambda b_: b_.v),
        tol=1e-12,
    )
    with pytest.raises(ValueError):
        V.probe(np.array([[2.0, 0.5]]), u)
    # probing at the DOF coordinates returns the DOF values (P1 nodal)
    coords = np.asarray(V._coords4global_dofs)
    vals, _ = V.probe(coords, u)
    np.testing.assert_allclose(
        np.asarray(vals), np.asarray(u).reshape(-1), atol=1e-12
    )
