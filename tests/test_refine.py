"""Mixed-precision iterative refinement (ops/refine.py).

The claim under test: an f32 inner PCG plus f64 residual recomputation
recovers the x64 dense-solve answer to near-f64, where the plain f32 path
stalls at the f32 noise floor (~1e-6 relative). This is the on-chip
doctrine closure of round-5 VERDICT item 5; these tests pin the math on
the x64 CPU backend (the TPU cost side lives in docs/performance.md).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.ops import compiled_refined_solver


def _poisson_problem(n=24):
    mesh = fem.MeshTri(fem.rectangle(n, n))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    a = lambda b_: b_.v_grad @ jnp.matrix_transpose(b_.v_grad)

    def l(b_):
        x = b_.integration_points[..., 0:1]
        y = b_.integration_points[..., 1:2]
        return (
            2
            * math.pi**2
            * jnp.sin(math.pi * x)
            * jnp.sin(math.pi * y)
            * b_.v
        )

    return V, a, l


def test_refined_solve_reaches_f64_grade():
    V, a, l = _poisson_problem()
    # x64 dense ground truth through the reference-parity path
    u_ref = V.solve(
        V.integrate_bilinear_form(a), V.solution_tensor(),
        V.integrate_linear_form(l),
    )

    solve = compiled_refined_solver(V, a, l, refine=2, tol32=1e-6)
    u, info = solve()
    assert u.dtype == jnp.float64

    err = float(jnp.abs(u - u_ref).max() / jnp.abs(u_ref).max())
    res = np.asarray(info.residuals)
    # stage residuals must DROP across passes and end at f64 grade
    assert res[0] > 1e-8  # the f32-only stage is f32-floored
    assert res[-1] < 1e-11, res
    assert res[-1] < res[0]
    assert err < 1e-9, err
    assert bool(info.converged)

    # the f32-only answer (pass 0) is measurably worse: rebuild at
    # refine=0 and compare directly
    u32, info32 = compiled_refined_solver(V, a, l, refine=0, tol32=1e-6)()
    err32 = float(jnp.abs(u32 - u_ref).max() / jnp.abs(u_ref).max())
    assert err32 > 10 * err  # refinement bought real digits


def test_refined_solve_explicit_rhs_and_vector_basis():
    # vector (elasticity-shaped) basis: the RBM affine coarse space path
    mesh = fem.MeshTri(fem.rectangle(10, 10))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))

    def a(b_):
        g = b_.v_grad
        return jnp.einsum("...icd,...jcd->...ij", g, g)

    def l(b_):
        return b_.v.sum(-1, keepdims=True)

    b_vec = V.integrate_linear_form(l)
    u_ref = V.solve(
        V.integrate_bilinear_form(a), V.solution_tensor(), b_vec
    )

    solve = compiled_refined_solver(V, a, refine=2, tol32=1e-5)
    u, info = solve(b_vec)
    err = float(jnp.abs(u - u_ref).max() / jnp.abs(u_ref).max())
    assert err < 1e-9, err
    assert np.asarray(info.residuals)[-1] < 1e-11

    with pytest.raises(ValueError, match="f64 right-hand side"):
        solve(b_vec.astype(jnp.float32))


def test_basis_compiled_refined_hook():
    V, a, l = _poisson_problem(n=8)
    u_ref = V.solve(
        V.integrate_bilinear_form(a), V.solution_tensor(),
        V.integrate_linear_form(l),
    )
    u, info = V.compiled_refined(a, l, refine=2)()
    assert float(jnp.abs(u - u_ref).max()) < 1e-12


def test_refined_solver_rejects_f32_basis():
    V, a, l = _poisson_problem(n=4)
    import jax

    f32_basis = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64
        else x,
        V,
    )
    with pytest.raises(ValueError, match="x64 basis"):
        compiled_refined_solver(f32_basis, a, l)
