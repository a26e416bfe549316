"""Generalized eigensolver: Laplace spectra vs analytic eigenvalues.

No reference counterpart (the reference has no eigen capability; dense LU
solves only, torch_fem/basis/abstract_basis.py:177-195). Validates
``ops.eigen.subspace_eigsh`` and ``AbstractBasis.solve_eigsh`` against the
closed-form Dirichlet Laplace spectrum pi^2 (m^2 + n^2 [+ p^2]) on the
unit square/cube, eigenvector residuals, and M-orthonormality.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube
from pytorch_fem_solver_tpu.ops.eigen import subspace_eigsh

PI2 = math.pi**2


def a_form(b):
    return b.v_grad @ jnp.matrix_transpose(b.v_grad)


def m_form(b):
    return b.v @ jnp.matrix_transpose(b.v)


def test_subspace_eigsh_dense_oracle():
    """Small dense SPD pencil vs scipy-free NumPy oracle (eigh of
    whitened matrix)."""
    rng = np.random.default_rng(0)
    n = 50
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    # graded spectrum: subspace iteration converges at (lam_i/lam_m)^rounds,
    # so a clustered spectrum would stall — like any power-type method
    a = q @ np.diag(np.arange(1.0, n + 1) ** 2) @ q.T
    qm = rng.normal(size=(n, n)) * 0.1
    m = qm @ qm.T + np.eye(n)
    li = np.linalg.inv(np.linalg.cholesky(m))
    ref = np.sort(np.linalg.eigvalsh(li @ a @ li.T))[:4]
    aj, mj = jnp.asarray(a), jnp.asarray(m)
    vals, vecs, info = subspace_eigsh(
        lambda v: aj @ v, lambda v: mj @ v, n=n, k=4, tol=1e-11
    )
    assert info.converged
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-8)
    # eigen residuals
    for j in range(4):
        x = np.asarray(vecs[:, j])
        r = a @ x - float(vals[j]) * (m @ x)
        assert np.linalg.norm(r) < 1e-6 * float(vals[j])


def test_lobpcg_dense_oracle():
    """ops.eigen.lobpcg_eigsh on a dense SPD pencil: eigenvalues match the
    whitened-eigh oracle; rank-deficient first round (P=0) and Jacobi
    preconditioning are exercised."""
    from pytorch_fem_solver_tpu.ops.eigen import lobpcg_eigsh

    rng = np.random.default_rng(0)
    n = 50
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    a = q @ np.diag(np.arange(1.0, n + 1) ** 2) @ q.T
    qm = rng.normal(size=(n, n)) * 0.1
    m = qm @ qm.T + np.eye(n)
    li = np.linalg.inv(np.linalg.cholesky(m))
    ref = np.sort(np.linalg.eigvalsh(li @ a @ li.T))[:4]
    aj, mj = jnp.asarray(a), jnp.asarray(m)
    x0 = jnp.asarray(rng.standard_normal((n, 6)))
    vals, vecs, (rounds, change, conv) = lobpcg_eigsh(
        lambda v: aj @ v,
        lambda v: mj @ v,
        x0,
        4,
        tol=1e-11,
        precond_diag=jnp.diag(aj),
    )
    assert bool(conv), (int(rounds), float(change))
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-9)
    # M-orthonormal eigenvectors
    g = np.asarray(vecs).T @ m @ np.asarray(vecs)
    np.testing.assert_allclose(g, np.eye(4), atol=1e-8)


def test_compiled_eigsh_lobpcg_matches_subspace():
    """The two compiled methods agree on the Laplace spectrum in x64.
    lobpcg is the shipped default since the round-4 blockwise
    M-orthonormalization + soft-locking rewrite: the on-chip f32 A/B
    (2026-08-19) measures it correct AND 4.5x faster than subspace
    (0.463 s vs 2.078 s at 100k DOFs, docs/performance.md)."""
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**8))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    vals_s, _, (_, _, conv_s) = V.compiled_eigsh(
        a_form, m_form, k=4, tol=1e-9, method="subspace"
    )()
    vals_l, vecs_l, (rounds, change, conv_l) = V.compiled_eigsh(
        a_form, m_form, k=4, tol=1e-9, method="lobpcg"
    )()
    assert bool(conv_s) and bool(conv_l), (int(rounds), float(change))
    np.testing.assert_allclose(
        np.asarray(vals_l), np.asarray(vals_s), rtol=1e-7
    )
    assert vecs_l.shape == (V.n_dofs, 4)
    with pytest.raises(ValueError, match="method"):
        V.compiled_eigsh(a_form, m_form, k=2, method="arnoldi")


def test_laplace_spectrum_unit_square():
    """First 4 Dirichlet modes converge to pi^2 (2, 5, 5, 8) from above
    at O(h^2); eigenvectors are M-orthonormal."""
    exact = np.array([2.0, 5.0, 5.0, 8.0]) * PI2
    rel = []
    for ma in (0.5**7, 0.5**9):
        mesh = fem.MeshTri(fem.unit_square(max_area=ma))
        V = fem.Basis(mesh, fem.ElementTri(1, 3))
        vals, vecs, info = V.solve_eigsh(
            a_form, m_form, k=4, tol=1e-8, return_info=True
        )
        assert info.converged
        vals = np.asarray(vals)
        assert (vals > exact).all()  # P1 Rayleigh quotients from above
        rel.append(np.abs(vals - exact) / exact)
        gram = np.asarray(
            V.reduce(V.integrate_bilinear_form(m_form))
        )
        inner = np.asarray(V._basis_parameters["inner_dofs"])
        vr = np.asarray(vecs)[inner]
        dev = np.abs(vr.T @ gram @ vr - np.eye(4)).max()
        assert dev < 1e-10, dev
    # O(h^2): one h-halving shrinks the error ~4x (allow 3x)
    assert (rel[1] < rel[0] / 3).all(), (rel[0], rel[1])


def test_laplace_first_mode_unit_cube():
    mesh = MeshTet(unit_cube(6))
    V = fem.Basis(mesh, ElementTet(1, 2))
    vals, _ = V.solve_eigsh(a_form, m_form, k=2, tol=1e-7)
    first = float(vals[0])
    exact = 3 * PI2
    # P1 from above; ~12% discretization error at h = 1/6
    assert exact < first < 1.2 * exact, first


def test_dfn_eigenmodes_finite_and_orthonormal():
    """The eigensolver runs on the glued fracture-network basis
    (tangential stiffness / surface mass pencil): finite ascending modes,
    M-orthonormal across the traces."""
    from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network

    f1 = [[-1, 0, 0], [1, 0, 0], [1, 1, 0], [-1, 1, 0]]
    f2 = [[0, 0, -1], [0, 0, 1], [0, 1, 1], [0, 1, -1]]
    mesh = build_fracture_network([f1, f2], h=0.2)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    vals, vecs, info = V.solve_eigsh(
        a_form, m_form, k=3, tol=1e-8, return_info=True
    )
    assert info.converged
    vals = np.asarray(vals)
    assert np.isfinite(vals).all() and (np.diff(vals) >= -1e-9).all()
    assert vals[0] > 0
    M = np.asarray(V.reduce(V.integrate_bilinear_form(m_form)))
    inner = np.asarray(V._basis_parameters["inner_dofs"])
    vr = np.asarray(vecs)[inner]
    assert np.abs(vr.T @ M @ vr - np.eye(3)).max() < 1e-9


def test_elasticity_eigenmodes_vs_dense_oracle():
    """Vector-valued pencil (elasticity stiffness, vector mass): the
    matrix-free eigensolver (RBM-coarse preconditioned inner solves)
    matches a dense whitened-eigh oracle on the same reduced matrices."""
    mu, lam = 1.0, 1.5

    def elasticity(b):
        g = b.v_grad
        eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
        div = jnp.trace(g, axis1=-2, axis2=-1)
        return (
            2 * mu * jnp.einsum("...icd,...jcd->...ij", eps, eps)
            + lam * div[..., :, None] * div[..., None, :]
        )

    def vmass(b):
        return jnp.einsum("...ic,...jc->...ij", b.v, b.v)

    mesh = fem.MeshTri(fem.unit_square(n=5))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    vals, vecs, info = V.solve_eigsh(
        elasticity, vmass, k=4, tol=1e-10, return_info=True
    )
    assert info.converged
    K = np.asarray(V.reduce(V.integrate_bilinear_form(elasticity)))
    M = np.asarray(V.reduce(V.integrate_bilinear_form(vmass)))
    li = np.linalg.inv(np.linalg.cholesky(M))
    ref = np.sort(np.linalg.eigvalsh(li @ K @ li.T))[:4]
    np.testing.assert_allclose(np.asarray(vals), ref, rtol=1e-7)


def test_compiled_eigsh_matches_eager():
    """compiled_eigsh (one-jit lax.while subspace iteration) agrees with
    the eager solve_eigsh; warm calls reuse the program."""
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**8))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    vals_e, _ = V.solve_eigsh(a_form, m_form, k=4, tol=1e-9)
    solve = V.compiled_eigsh(a_form, m_form, k=4, tol=1e-9)
    vals_c, vecs_c, (rounds, change, conv) = solve()
    assert bool(conv)
    np.testing.assert_allclose(
        np.asarray(vals_c), np.asarray(vals_e), rtol=1e-8
    )
    assert vecs_c.shape == (V.n_dofs, 4)
    # warm call: same program, same result
    vals_c2, _, _ = solve()
    np.testing.assert_allclose(
        np.asarray(vals_c2), np.asarray(vals_c), atol=0
    )
    with pytest.raises(ValueError):
        V.compiled_eigsh(a_form, m_form, k=2, precondition="ilu")
    with pytest.raises(ValueError):
        V.compiled_eigsh(a_form, m_form, k=10**6)


def test_solve_eigsh_validation():
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    with pytest.raises(ValueError):
        V.solve_eigsh(a_form, m_form, k=1000)
    with pytest.raises(ValueError):
        V.solve_eigsh(a_form, m_form, k=2, precondition="nope")


def test_solve_eigsh_tiny_system_guard_block_clamped():
    """k <= n_inner < k + guard: the guard block must clamp to the reduced
    dimension instead of overspanning it (regression: singular projected
    Gram -> silent NaNs). n=3 unit square has n_inner=4; k=3 exercises it,
    k=4 is the full spectrum."""
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    A = np.asarray(V.reduce(V.integrate_bilinear_form(a_form)))
    M = np.asarray(V.reduce(V.integrate_bilinear_form(m_form)))
    li = np.linalg.inv(np.linalg.cholesky(M))
    ref = np.sort(np.linalg.eigvalsh(li @ A @ li.T))
    for k in (3, 4):
        vals, _, info = V.solve_eigsh(
            a_form, m_form, k=k, tol=1e-10, return_info=True
        )
        assert np.isfinite(np.asarray(vals)).all()
        np.testing.assert_allclose(np.asarray(vals), ref[:k], rtol=1e-7)


def test_compiled_eigsh_vector_rbm_two_level():
    """precondition='two_level' on a vector basis (previously
    NotImplementedError) uses the rigid-body-mode coarse space inside the
    compiled program and matches the eager RBM-preconditioned solve."""
    mu, lam = 1.0, 1.5

    def elasticity(b):
        g = b.v_grad
        eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
        div = jnp.trace(g, axis1=-2, axis2=-1)
        return (
            2 * mu * jnp.einsum("...icd,...jcd->...ij", eps, eps)
            + lam * div[..., :, None] * div[..., None, :]
        )

    def vmass(b):
        return jnp.einsum("...ic,...jc->...ij", b.v, b.v)

    mesh = fem.MeshTri(fem.unit_square(n=5))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    vals_e, _ = V.solve_eigsh(elasticity, vmass, k=4, tol=1e-10)
    solve = V.compiled_eigsh(
        elasticity, vmass, k=4, tol=1e-10, precondition="two_level"
    )
    vals_c, vecs_c, (rounds, change, conv) = solve()
    assert bool(conv)
    np.testing.assert_allclose(
        np.asarray(vals_c), np.asarray(vals_e), rtol=1e-7
    )
    assert vecs_c.shape == (V.n_dofs, 4)
