"""Nonlinear solves: BiCGStab + Newton with autodiff consistent Jacobians.

No reference counterpart: the reference solves only linear systems (dense
LU, ``/root/reference/torch_fem/basis/abstract_basis.py:177-195``). Here
the weak residual form is a JAX closure, so the consistent Jacobian comes
from ``jax.jvp`` against local-coefficient tangents, and the non-symmetric
linearizations are solved by matrix-free BiCGStab on the same BSR/ELL
operators as the linear path.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube
from pytorch_fem_solver_tpu.ops import bicgstab, pcg

PI = math.pi


# -- bicgstab ------------------------------------------------------------------


def test_bicgstab_nonsymmetric_dense_oracle():
    rng = np.random.default_rng(3)
    n = 60
    a = np.eye(n) * 8.0 + rng.normal(size=(n, n))  # diagonally dominant
    b = rng.normal(size=n)
    x_ref = np.linalg.solve(a, b)
    aj = jnp.asarray(a)
    x, info = bicgstab(lambda v: aj @ v, jnp.asarray(b), tol=1e-12)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=1e-9)
    # preconditioned variant
    x2, info2 = bicgstab(
        lambda v: aj @ v,
        jnp.asarray(b),
        precond_diag=jnp.diag(aj),
        tol=1e-12,
    )
    assert bool(info2.converged)
    np.testing.assert_allclose(np.asarray(x2), x_ref, atol=1e-9)


def test_bicgstab_matches_pcg_on_spd():
    rng = np.random.default_rng(5)
    n = 40
    m = rng.normal(size=(n, n))
    a = jnp.asarray(m @ m.T + n * np.eye(n))
    b = jnp.asarray(rng.normal(size=n))
    x_cg, i_cg = pcg(lambda v: a @ v, b, tol=1e-12)
    x_bi, i_bi = bicgstab(lambda v: a @ v, b, tol=1e-12)
    assert bool(i_cg.converged) and bool(i_bi.converged)
    np.testing.assert_allclose(np.asarray(x_bi), np.asarray(x_cg), atol=1e-8)


def test_solve_iterative_bicgstab_matches_cg_on_poisson():
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**6))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    a = lambda b_: b_.v_grad @ jnp.matrix_transpose(b_.v_grad)
    l = lambda b_: b_.v
    local = V.integrate_bilinear_form_local(a)
    b = V.integrate_linear_form(l)
    u_cg = V.solve_iterative(local, b, tol=1e-12)
    u_bi = V.solve_iterative(local, b, tol=1e-12, solver="bicgstab")
    np.testing.assert_allclose(
        np.asarray(u_bi), np.asarray(u_cg), atol=1e-10
    )
    with pytest.raises(ValueError):
        V.solve_iterative(local, b, solver="gmres")


# -- newton --------------------------------------------------------------------


def _rhs_2d(p):
    x, y = p[..., 0:1], p[..., 1:2]
    u = jnp.sin(PI * x) * jnp.sin(PI * y)
    ux = PI * jnp.cos(PI * x) * jnp.sin(PI * y)
    uy = PI * jnp.sin(PI * x) * jnp.cos(PI * y)
    lap = -2 * PI**2 * u
    return -(2 * u * (ux**2 + uy**2) + (1 + u**2) * lap)


def _residual_2d(b, u, ug):
    kappa = 1.0 + u**2
    return (
        kappa * (b.v_grad * ug).sum(-1, keepdims=True)
        - _rhs_2d(b.integration_points) * b.v
    )


def test_newton_nonlinear_poisson_quadratic_and_h1_rate():
    """-div((1+u^2) grad u) = f, manufactured solution: Newton converges
    quadratically and the P1 H1 error halves per h-halving."""
    errs = []
    for ma in (0.5**5, 0.5**7):
        mesh = fem.MeshTri(fem.unit_square(max_area=ma))
        V = fem.Basis(mesh, fem.ElementTri(1, 3))
        u, info = V.solve_newton(_residual_2d, tol=1e-12, return_info=True)
        assert info["converged"]
        uh, ug = V.interpolate(V, u)

        def h1(b_):
            x = b_.integration_points[..., 0:1]
            y = b_.integration_points[..., 1:2]
            ex = jnp.sin(PI * x) * jnp.sin(PI * y)
            gx = PI * jnp.cos(PI * x) * jnp.sin(PI * y)
            gy = PI * jnp.sin(PI * x) * jnp.cos(PI * y)
            return (
                (uh - ex) ** 2
                + (ug[..., 0:1] - gx) ** 2
                + (ug[..., 1:2] - gy) ** 2
            )

        errs.append(float(jnp.sqrt(V.integrate_functional(h1).sum())))
        # quadratic tail: once the residual is < 1e-2, each step at least
        # squares it (up to a constant)
        tail = [n for n in info["residual_norms"] if 1e-14 < n < 1e-2]
        for r_prev, r_next in zip(tail, tail[1:]):
            assert r_next < 20 * r_prev**2, info["residual_norms"]
    rate = math.log2(errs[0] / errs[1]) / 2  # area/4 per step = h/2
    assert 0.8 < rate * 2 < 1.2, (errs, rate)


def test_newton_on_linear_problem_single_step():
    """On a linear PDE the first Newton step lands on the solution of
    solve_iterative exactly (the Jacobian IS the stiffness matrix)."""
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**6))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))

    def residual(b_, u, ug):
        return (b_.v_grad * ug).sum(-1, keepdims=True) - b_.v

    u_newton, info = V.solve_newton(residual, tol=1e-10, return_info=True)
    assert info["iterations"] == 1, info
    a = lambda b_: b_.v_grad @ jnp.matrix_transpose(b_.v_grad)
    u_lin = V.solve_iterative(
        V.integrate_bilinear_form_local(a),
        V.integrate_linear_form(lambda b_: b_.v),
        tol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(u_newton), np.asarray(u_lin), atol=1e-7
    )


def test_newton_nonhomogeneous_dirichlet_recovers_linear_exact():
    """u* = 1 + x solves -div((1+u^2) grad u) = -2(1+x); seeding the
    boundary DOFs with u* makes Newton reproduce it to solver precision
    (u* is in the P1 space and the quadrature is exact)."""
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**5))
    V = fem.Basis(mesh, fem.ElementTri(1, 4))

    def residual(b_, u, ug):
        f = -2.0 * (1.0 + b_.integration_points[..., 0:1])
        return (1 + u**2) * (b_.v_grad * ug).sum(-1, keepdims=True) - f * b_.v

    coords = np.asarray(V._coords4global_dofs)
    exact = 1.0 + coords[:, 0:1]
    boundary = np.asarray(V._nodes4boundary_dofs).reshape(-1) != 0
    seed = jnp.asarray(np.where(boundary[:, None], exact, 0.0))
    u, info = V.solve_newton(
        residual, solution=seed, tol=1e-12, return_info=True
    )
    assert info["converged"]
    np.testing.assert_allclose(np.asarray(u), exact, atol=1e-8)


def test_compiled_newton_matches_eager():
    """compiled_newton (one-jit lax.while Newton) lands on the eager
    solve_newton solution; warm calls reuse the compiled program."""
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**7))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    u_eager = V.solve_newton(_residual_2d, tol=1e-12)
    solve = V.compiled_newton(_residual_2d, tol=1e-12, solve_tol=1e-10)
    u_c, (k, res, conv) = solve()
    assert bool(conv) and int(k) <= 8
    np.testing.assert_allclose(
        np.asarray(u_c), np.asarray(u_eager), atol=1e-10
    )
    # warm re-solve with an explicit seed reuses the program
    u_c2, _ = solve(V.solution_tensor())
    np.testing.assert_allclose(np.asarray(u_c2), np.asarray(u_c), atol=0)
    # aggregate-block preconditioned variant agrees
    u_a, (_, _, conv_a) = V.compiled_newton(
        _residual_2d, tol=1e-12, solve_tol=1e-10, precondition="auto"
    )()
    assert bool(conv_a)
    np.testing.assert_allclose(np.asarray(u_a), np.asarray(u_c), atol=1e-9)
    with pytest.raises(ValueError):
        V.compiled_newton(_residual_2d, precondition="ilu")


def test_compiled_newton_3d_seeded_dirichlet():
    mesh = MeshTet(unit_cube(3))
    V = fem.Basis(mesh, ElementTet(1, 3))

    def residual(b_, u, ug):
        f = -2.0 * (1.0 + b_.integration_points[..., 2:3])
        return (1 + u**2) * (b_.v_grad * ug).sum(-1, keepdims=True) - f * b_.v

    coords = np.asarray(V._coords4global_dofs)
    exact = 1.0 + coords[:, 2:3]
    boundary = np.asarray(V._nodes4boundary_dofs).reshape(-1) != 0
    seed = jnp.asarray(np.where(boundary[:, None], exact, 0.0))
    u, (_, _, conv) = V.compiled_newton(residual, tol=1e-11)(seed)
    assert bool(conv)
    np.testing.assert_allclose(np.asarray(u), exact, atol=1e-7)


def test_compiled_newton_transient_args():
    """Per-solve args thread time-stepping state through the compiled
    program: one backward-Euler step of the LINEAR heat equation written
    as a Newton residual (with u_n passed via args) matches the algebraic
    (M + dt K) u = M u_n solve; the nonlinear (stiffening) variant decays
    the energy strictly and at least as fast."""
    dt = 1e-3
    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**6))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    coords = np.asarray(V._coords4global_dofs)
    u0 = jnp.asarray(
        (np.sin(PI * coords[:, 0]) * np.sin(PI * coords[:, 1])).reshape(-1, 1)
    )
    uh0, _ = V.interpolate(V, u0)

    def lin_res(b_, u, ug, uh_prev):
        return (u - uh_prev) / dt * b_.v + (b_.v_grad * ug).sum(
            -1, keepdims=True
        )

    u1, (_, _, conv) = V.compiled_newton(lin_res, tol=1e-12)(u0, uh0)
    assert bool(conv)
    # algebraic backward Euler on the same step
    K = V.integrate_bilinear_form(
        lambda b_: b_.v_grad @ jnp.matrix_transpose(b_.v_grad)
    )
    M = V.integrate_bilinear_form(
        lambda b_: b_.v @ jnp.matrix_transpose(b_.v)
    )
    u_ref = V.solve(M + dt * K, V.solution_tensor(), M @ u0)
    np.testing.assert_allclose(
        np.asarray(u1), np.asarray(u_ref), atol=1e-9
    )

    def nl_res(b_, u, ug, uh_prev):
        return (u - uh_prev) / dt * b_.v + (1 + u**2) * (
            b_.v_grad * ug
        ).sum(-1, keepdims=True)

    solve_nl = V.compiled_newton(nl_res, tol=1e-11)
    energy = lambda uu: float(
        V.integrate_functional(
            lambda b_, s: s**2, V.interpolate(V, uu)[0]
        ).sum()
    )
    solve_lin = V.compiled_newton(lin_res, tol=1e-11)
    u_lin, u_nl = u0, u0
    e_prev = energy(u0)
    for _ in range(3):
        uh_lin, _ = V.interpolate(V, u_lin)
        uh_nl, _ = V.interpolate(V, u_nl)
        u_lin, _ = solve_lin(u_lin, uh_lin)
        u_nl, (_, _, c2) = solve_nl(u_nl, uh_nl)
        assert bool(c2)
        e_nl = energy(u_nl)
        assert e_nl < e_prev  # strict decay
        e_prev = e_nl
    assert energy(u_nl) < energy(u_lin)  # stiffening diffuses faster


def test_newton_vector_basis_nonlinear_elasticity():
    """Vector-basis Newton: the iterate rides with the component axis
    (u: (T,q,1,nc), ug: (T,q,1,nc,d)). A linear elasticity residual lands
    on solve_iterative in one step; a strain-stiffening mu(u) converges
    with a quadratic tail, identically in eager and compiled paths."""
    mu0, lam = 1.0, 1.5

    def bodyf(b_):
        f = jnp.asarray([0.0, -1.0])
        return jnp.einsum("c,...lc->...l", f, b_.v)[..., None]

    def elasticity(b_):
        g = b_.v_grad
        eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
        div = jnp.trace(g, axis1=-2, axis2=-1)
        return (
            2 * mu0 * jnp.einsum("...icd,...jcd->...ij", eps, eps)
            + lam * div[..., :, None] * div[..., None, :]
        )

    def residual(b_, u, ug, stiffening):
        mu_u = mu0 * (1.0 + stiffening * (u**2).sum(-1, keepdims=True))
        eps_u = 0.5 * (ug + jnp.swapaxes(ug, -1, -2))
        eps_v = 0.5 * (b_.v_grad + jnp.swapaxes(b_.v_grad, -1, -2))
        div_u = jnp.trace(ug, axis1=-2, axis2=-1)
        div_v = jnp.trace(b_.v_grad, axis1=-2, axis2=-1)
        return (
            2 * mu_u * jnp.einsum("...ocd,...lcd->...lo", eps_u, eps_v)
            + lam * (div_u[..., None, :] * div_v[..., :, None])
            - bodyf(b_)
        )

    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**6))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 3))
    u_lin = V.solve_iterative(
        V.integrate_bilinear_form_local(elasticity),
        V.integrate_linear_form(bodyf),
        tol=1e-12,
        precondition="rbm",
    )
    u1, info1 = V.solve_newton(residual, 0.0, tol=1e-11, return_info=True)
    assert info1["converged"] and info1["iterations"] == 1
    np.testing.assert_allclose(
        np.asarray(u1), np.asarray(u_lin), atol=1e-9
    )

    u_nl, info = V.solve_newton(residual, 1.0, tol=1e-12, return_info=True)
    assert info["converged"] and info["iterations"] <= 5
    # quadratic tail, above the f64 rounding floor
    tail = [n for n in info["residual_norms"] if 1e-14 < n < 1e-2]
    for r_prev, r_next in zip(tail, tail[1:]):
        assert r_next < 20 * r_prev**2, info["residual_norms"]

    u_c, (_, _, conv) = V.compiled_newton(
        lambda b_, u, ug: residual(b_, u, ug, 1.0), tol=1e-12
    )()
    assert bool(conv)
    np.testing.assert_allclose(
        np.asarray(u_c), np.asarray(u_nl), atol=1e-12
    )


def test_newton_on_fracture_network():
    """Newton is generic over bases: on a glued two-fracture network, a
    linear-coefficient residual lands on the solve_iterative solution in
    one step, and a nonlinear coefficient converges with a quadratic
    tail (tangential gradients ride through the jvp unchanged)."""
    from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network

    f1 = [[-1, 0, 0], [1, 0, 0], [1, 1, 0], [-1, 1, 0]]
    f2 = [[0, 0, -1], [0, 0, 1], [0, 1, 1], [0, 1, -1]]
    mesh = build_fracture_network([f1, f2], h=0.25)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 3))

    def lin_residual(b_, u, ug):
        return (b_.v_grad * ug).sum(-1, keepdims=True) - b_.v

    u_newton, info = V.solve_newton(lin_residual, tol=1e-10, return_info=True)
    assert info["converged"] and info["iterations"] == 1
    a = lambda b_: b_.v_grad @ jnp.matrix_transpose(b_.v_grad)
    u_lin = V.solve_iterative(
        V.integrate_bilinear_form_local(a),
        V.integrate_linear_form(lambda b_: b_.v),
        tol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(u_newton), np.asarray(u_lin), atol=1e-7
    )

    def nl_residual(b_, u, ug):
        return (1 + u**2) * (b_.v_grad * ug).sum(-1, keepdims=True) - b_.v

    u_nl, info_nl = V.solve_newton(nl_residual, tol=1e-12, return_info=True)
    assert info_nl["converged"]
    tail = [n for n in info_nl["residual_norms"] if 1e-14 < n < 1e-2]
    for r_prev, r_next in zip(tail, tail[1:]):
        assert r_next < 20 * r_prev**2, info_nl["residual_norms"]
    # the nonlinear conductivity differs measurably from the linear one
    assert float(jnp.abs(u_nl - u_lin).max()) > 1e-4


def test_newton_3d():
    """The Newton path is dimension-agnostic: 3D nonlinear Poisson with a
    linear-in-space exact solution through seeded Dirichlet data."""
    mesh = MeshTet(unit_cube(4))
    V = fem.Basis(mesh, ElementTet(1, 3))

    def residual(b_, u, ug):
        f = -2.0 * (1.0 + b_.integration_points[..., 2:3])
        return (1 + u**2) * (b_.v_grad * ug).sum(-1, keepdims=True) - f * b_.v

    coords = np.asarray(V._coords4global_dofs)
    exact = 1.0 + coords[:, 2:3]
    boundary = np.asarray(V._nodes4boundary_dofs).reshape(-1) != 0
    seed = jnp.asarray(np.where(boundary[:, None], exact, 0.0))
    u, info = V.solve_newton(
        residual, solution=seed, tol=1e-11, return_info=True
    )
    assert info["converged"]
    np.testing.assert_allclose(np.asarray(u), exact, atol=1e-7)


def test_compiled_newton_vector_rbm_auto():
    """precondition='auto' on a vector basis threads the rigid-body-mode
    coarse space through the compiled Newton program (structure host-built
    once, numeric setup per step inside the while_loop) and lands on the
    eager solution."""
    mu0, lam = 1.0, 1.5

    def bodyf(b_):
        f = jnp.asarray([0.0, -1.0])
        return jnp.einsum("c,...lc->...l", f, b_.v)[..., None]

    def residual(b_, u, ug):
        mu_u = mu0 * (1.0 + (u**2).sum(-1, keepdims=True))
        eps_u = 0.5 * (ug + jnp.swapaxes(ug, -1, -2))
        eps_v = 0.5 * (b_.v_grad + jnp.swapaxes(b_.v_grad, -1, -2))
        div_u = jnp.trace(ug, axis1=-2, axis2=-1)
        div_v = jnp.trace(b_.v_grad, axis1=-2, axis2=-1)
        return (
            2 * mu_u * jnp.einsum("...ocd,...lcd->...lo", eps_u, eps_v)
            + lam * (div_u[..., None, :] * div_v[..., :, None])
            - bodyf(b_)
        )

    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**6))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 3))
    u_ref, info = V.solve_newton(residual, tol=1e-12, return_info=True)
    assert info["converged"]

    u_c, (k, res, conv) = V.compiled_newton(
        residual, tol=1e-12, precondition="auto"
    )()
    assert bool(conv)
    np.testing.assert_allclose(np.asarray(u_c), np.asarray(u_ref), atol=1e-11)
