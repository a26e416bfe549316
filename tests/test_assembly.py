"""Assembly correctness against independent analytic/golden oracles.

The reference validates assembly against scikit-fem
(/root/reference/tests/test_assembly.py:19-110); scikit-fem is not available
here, so the oracles are (a) an independent NumPy reimplementation of P1
assembly from closed-form element formulas, (b) exact integrals, and (c) the
P1 patch test (linear exact solution reproduced to machine precision).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def mass_form(basis):
    return basis.v @ jnp.matrix_transpose(basis.v)


def numpy_p1_poisson(vertices, triangles, rhs_fn):
    """Independent dense P1 assembly using closed-form element matrices."""
    n = vertices.shape[0]
    A = np.zeros((n, n))
    M = np.zeros((n, n))
    b = np.zeros(n)
    for tri in triangles:
        p = vertices[tri]
        J = np.stack([p[1] - p[0], p[2] - p[0]], axis=1)  # columns are edges
        det = np.linalg.det(J)
        area = 0.5 * abs(det)
        # gradients of barycentric coords: rows of inv(J)^T times ref grads
        grads = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]]) @ np.linalg.inv(J)
        A_loc = area * grads @ grads.T
        M_loc = area / 12.0 * (np.ones((3, 3)) + np.eye(3))
        centroid_thirds = (p + np.roll(p, -1, axis=0)) / 2.0  # edge midpoints
        # exact-for-P1 load via midpoint rule: f at edge midpoints
        f_mid = np.array([rhs_fn(*mp) for mp in centroid_thirds])
        b_loc = area / 3.0 * np.array(
            [
                (f_mid[0] + f_mid[2]) / 2.0,
                (f_mid[0] + f_mid[1]) / 2.0,
                (f_mid[1] + f_mid[2]) / 2.0,
            ]
        )
        for i in range(3):
            b[tri[i]] += b_loc[i]
            for j in range(3):
                A[tri[i], tri[j]] += A_loc[i, j]
                M[tri[i], tri[j]] += M_loc[i, j]
    return A, M, b


@pytest.fixture(scope="module")
def square_basis():
    mesh = fem.MeshTri(fem.unit_square(n=6))
    return fem.Basis(mesh, fem.ElementTri(1, 2))


def test_stiffness_vs_numpy_oracle(square_basis):
    V = square_basis
    verts = np.asarray(V.mesh["vertices", "coordinates"])
    tris = np.asarray(V.mesh["cells", "vertices"])
    A_ref, M_ref, _ = numpy_p1_poisson(verts, tris, lambda x, y: 0.0)

    A = np.asarray(V.integrate_bilinear_form(stiffness_form))
    M = np.asarray(V.integrate_bilinear_form(mass_form))

    assert np.linalg.norm(A - A_ref) / np.linalg.norm(A_ref) < 1e-13
    assert np.linalg.norm(M - M_ref) / np.linalg.norm(M_ref) < 1e-13


def test_load_vector_midpoint_oracle():
    # integration order 2 is exact for the bilinear integrand f*v with f
    # linear, and so is the midpoint-rule oracle
    mesh = fem.MeshTri(fem.unit_square(n=5))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))

    def f(x, y):
        return 3.0 * x - 2.0 * y + 1.0

    def load(basis):
        x = basis.integration_points[..., 0:1]
        y = basis.integration_points[..., 1:2]
        return f(x, y) * basis.v

    b = np.asarray(V.integrate_linear_form(load)).reshape(-1)
    verts = np.asarray(V.mesh["vertices", "coordinates"])
    tris = np.asarray(V.mesh["cells", "vertices"])
    _, _, b_ref = numpy_p1_poisson(verts, tris, f)
    assert np.linalg.norm(b - b_ref) / np.linalg.norm(b_ref) < 1e-13


def test_stiffness_invariants(square_basis):
    A = np.asarray(square_basis.integrate_bilinear_form(stiffness_form))
    np.testing.assert_allclose(A, A.T, atol=1e-13)
    np.testing.assert_allclose(A.sum(axis=1), 0.0, atol=1e-12)


def test_mass_total_is_area(square_basis):
    M = np.asarray(square_basis.integrate_bilinear_form(mass_form))
    assert abs(M.sum() - 1.0) < 1e-13


def test_integrate_functional_exact():
    mesh = fem.MeshTri(fem.unit_square(n=4))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))

    def f(basis):
        x = basis.integration_points[..., 0:1]
        y = basis.integration_points[..., 1:2]
        return x**2 + y**2

    total = float(V.integrate_functional(f).sum())
    assert abs(total - 2.0 / 3.0) < 1e-13


def test_patch_test_linear_exactness():
    """P1 FEM reproduces a globally linear solution to machine precision."""
    mesh = fem.MeshTri(fem.rectangle(4, 3, pattern="alternating"))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))

    def exact(x, y):
        return 2.0 * x - 3.0 * y + 0.5

    A = V.integrate_bilinear_form(stiffness_form)
    coords = np.asarray(V._coords4global_dofs)
    u_exact = jnp.asarray(exact(coords[:, 0], coords[:, 1]).reshape(-1, 1))

    # Dirichlet lifting: solve A_II u_I = -A_IB u_B with exact boundary values
    inner = V._basis_parameters["inner_dofs"]
    u_bc = u_exact.at[inner, :].set(0.0)
    b = -(A @ u_bc)
    u = V.solve(A, u_bc, b)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_exact), atol=1e-12)


def test_dense_vs_matrix_free(square_basis):
    V = square_basis
    A = np.asarray(V.reduce(V.integrate_bilinear_form(stiffness_form)))
    local = V.integrate_bilinear_form_local(stiffness_form)

    from pytorch_fem_solver_tpu.ops.operators import reduced_operator_from_local

    matvec, diag = reduced_operator_from_local(V, local)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=A.shape[0]))
    np.testing.assert_allclose(np.asarray(matvec(x)), A @ np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(diag), np.diag(A), atol=1e-12)


def test_pcg_matches_dense_solve(square_basis):
    V = square_basis

    def load(basis):
        x = basis.integration_points[..., 0:1]
        y = basis.integration_points[..., 1:2]
        return (
            2.0
            * math.pi**2
            * jnp.sin(math.pi * x)
            * jnp.sin(math.pi * y)
            * basis.v
        )

    A = V.integrate_bilinear_form(stiffness_form)
    b = V.integrate_linear_form(load)
    u_dense = V.solve(A, V.solution_tensor(), b)

    local = V.integrate_bilinear_form_local(stiffness_form)
    u_pcg = V.solve_iterative(local, b, tol=1e-13)
    np.testing.assert_allclose(np.asarray(u_pcg), np.asarray(u_dense), atol=1e-10)


@pytest.mark.parametrize("poly_order,rate", [(1, 1.0), (2, 2.0)])
def test_h1_convergence_rate(poly_order, rate):
    """Manufactured Poisson solution: H1 error must decay at O(h^rate)."""

    def exact(x, y):
        return jnp.sin(math.pi * x) * jnp.sin(math.pi * y)

    def load(basis):
        x = basis.integration_points[..., 0:1]
        y = basis.integration_points[..., 1:2]
        return 2.0 * math.pi**2 * exact(x, y) * basis.v

    def h1_err(basis, uh, uh_grad):
        x = basis.integration_points[..., 0:1]
        y = basis.integration_points[..., 1:2]
        dx = math.pi * jnp.cos(math.pi * x) * jnp.sin(math.pi * y)
        dy = math.pi * jnp.sin(math.pi * x) * jnp.cos(math.pi * y)
        return (
            (uh - exact(x, y)) ** 2
            + (uh_grad[..., 0:1] - dx) ** 2
            + (uh_grad[..., 1:2] - dy) ** 2
        )

    errors = []
    for n in (4, 8, 16):
        mesh = fem.MeshTri(fem.unit_square(n=n))
        V = fem.Basis(mesh, fem.ElementTri(poly_order, 4))
        A = V.integrate_bilinear_form(stiffness_form)
        b = V.integrate_linear_form(load)
        u = V.solve(A, V.solution_tensor(), b)
        Iu, Iu_grad = V.interpolate(V, u)
        errors.append(float(jnp.sqrt(V.integrate_functional(h1_err, Iu, Iu_grad).sum())))

    observed = np.log2(np.array(errors[:-1]) / np.array(errors[1:]))
    assert (observed > rate - 0.25).all(), (errors, observed)
