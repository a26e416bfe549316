"""compiled_bsr_solver: the one-jit assemble+solve pipeline == dense solve.

Covers the constants-vs-arguments composition promoted out of bench.py
(docs/performance.md): scalar 2D, right-hand-side-as-argument, vector (RBM
coarse space) and 3D tetrahedral bases, plus option validation.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.ops import compiled_bsr_solver


def stiffness(b):
    return b.v_grad @ jnp.matrix_transpose(b.v_grad)


def sine_load(b):
    x, y = b.integration_points[..., 0:1], b.integration_points[..., 1:2]
    return 2 * math.pi**2 * jnp.sin(math.pi * x) * jnp.sin(math.pi * y) * b.v


@pytest.fixture(scope="module")
def square():
    mesh = fem.MeshTri(fem.unit_square(n=16))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    u_dense = V.solve(
        V.integrate_bilinear_form(stiffness),
        V.solution_tensor(),
        V.integrate_linear_form(sine_load),
    )
    return V, u_dense


def test_compiled_matches_dense(square):
    V, u_dense = square
    solve = V.compiled_solver(stiffness, sine_load, tol=1e-12)
    u, info = solve()
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_dense), atol=1e-11)
    # second call reuses the compiled program and stays correct
    u2, _ = solve()
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))


def test_compiled_rhs_as_argument(square):
    V, u_dense = square
    solve = compiled_bsr_solver(V, stiffness, None, tol=1e-12)
    u, info = solve(V.integrate_linear_form(sine_load))
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_dense), atol=1e-11)


def test_compiled_jacobi_and_validation(square):
    V, u_dense = square
    solve = V.compiled_solver(
        stiffness, sine_load, tol=1e-12, precondition="jacobi"
    )
    u, info = solve()
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_dense), atol=1e-11)
    with pytest.raises(ValueError):
        V.compiled_solver(stiffness, sine_load, precondition="mult3")


def test_compiled_vector_rbm():
    def elast(b):
        g = b.v_grad
        eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
        div = jnp.trace(g, axis1=-2, axis2=-1)
        return 2 * jnp.einsum("...icd,...jcd->...ij", eps, eps) + 1.5 * div[
            ..., :, None
        ] * div[..., None, :]

    def vload(b):
        x = b.integration_points[..., 0]
        f = jnp.stack([jnp.sin(math.pi * x), jnp.cos(math.pi * x)], axis=-1)
        return (b.v * f).sum(-1, keepdims=True)

    mesh = fem.MeshTri(fem.unit_square(n=12))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    u_dense = V.solve(
        V.integrate_bilinear_form(elast),
        V.solution_tensor(),
        V.integrate_linear_form(vload),
    )
    u, info = V.compiled_solver(elast, vload, tol=1e-12)()
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_dense), atol=1e-10)


def test_compiled_3d_tet():
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    def load3(b):
        p = b.integration_points
        return (
            3
            * math.pi**2
            * jnp.sin(math.pi * p[..., 0:1])
            * jnp.sin(math.pi * p[..., 1:2])
            * jnp.sin(math.pi * p[..., 2:3])
            * b.v
        )

    mesh = MeshTet(unit_cube(5))
    V = fem.Basis(mesh, ElementTet(1, 2))
    u_dense = V.solve(
        V.integrate_bilinear_form(stiffness),
        V.solution_tensor(),
        V.integrate_linear_form(load3),
    )
    u, info = V.compiled_solver(stiffness, load3, tol=1e-12)()
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_dense), atol=1e-10)


def test_compiled_chunked_assembly_matches_plain():
    """Chunked symmetric scatter (lax.scan streaming) == one-shot, with a
    non-dividing chunk size (exercises the zero-pad + OOB-slot drop) and a
    variable-coefficient form reading integration_points."""
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    def load3(b):
        return (1.0 + b.integration_points[..., 2:3]) * b.v

    mesh = MeshTet(unit_cube(4))
    V = fem.Basis(mesh, ElementTet(1, 2))

    def var_stiffness(b):
        x = b.integration_points[..., 0:1]
        return (1.0 + x**2) * (b.v_grad @ jnp.matrix_transpose(b.v_grad))

    u_plain, _ = V.compiled_solver(var_stiffness, load3, tol=1e-12)()
    u_chunk, info = V.compiled_solver(
        var_stiffness, load3, tol=1e-12, chunk_cells=100
    )()
    assert bool(info.converged)
    np.testing.assert_array_equal(np.asarray(u_chunk), np.asarray(u_plain))


def test_compiled_chunked_view_guards_unsupported_access():
    mesh = fem.MeshTri(fem.unit_square(n=6))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))

    def bad_form(b):
        return b.mesh  # not part of the chunk view surface

    with pytest.raises(AttributeError, match="chunked assembly"):
        V.compiled_solver(bad_form, None, chunk_cells=16)(
            jnp.zeros((V.n_dofs, 1))
        )


def test_compiled_chunked_vector_basis():
    """Chunking on a VectorBasis (5-dim v_grad): the cell count and n_loc
    must come from the DOF map, not v_grad's trailing axes."""

    def elast(b):
        g = b.v_grad
        eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
        div = jnp.trace(g, axis1=-2, axis2=-1)
        return 2 * jnp.einsum("...icd,...jcd->...ij", eps, eps) + div[
            ..., :, None
        ] * div[..., None, :]

    def vload(b):
        x = b.integration_points[..., 0]
        f = jnp.stack([jnp.sin(math.pi * x), jnp.cos(math.pi * x)], axis=-1)
        return (b.v * f).sum(-1, keepdims=True)

    mesh = fem.MeshTri(fem.unit_square(n=10))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    u_plain, _ = V.compiled_solver(elast, vload, tol=1e-12)()
    u_chunk, _ = V.compiled_solver(elast, vload, tol=1e-12, chunk_cells=32)()
    np.testing.assert_array_equal(np.asarray(u_chunk), np.asarray(u_plain))


def test_compiled_rejects_nonsymmetric_form_under_symmetric_default():
    """symmetric_form=True (the default) with a non-symmetric form would
    silently solve a symmetrized system; the construction-time probe must
    catch it."""
    mesh = fem.MeshTri(fem.unit_square(n=6))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))

    def advection(b):
        return b.v_grad[..., 0:1] @ jnp.matrix_transpose(b.v) + b.v_grad @ (
            jnp.matrix_transpose(b.v_grad)
        )

    with pytest.raises(ValueError, match="not symmetric"):
        V.compiled_solver(advection, None)
    # explicit non-symmetric chunking is not supported and must say so
    with pytest.raises(ValueError, match="chunk_cells requires"):
        compiled_bsr_solver(
            V, advection, None, symmetric_form=False, chunk_cells=16
        )
    # with the flag, the general scatter path solves it correctly
    solve = compiled_bsr_solver(
        V, advection, None, symmetric_form=False, tol=1e-12,
        precondition="jacobi",
    )
    b = V.integrate_linear_form(lambda bb: bb.v)
    u, _ = solve(b)
    u_dense = V.solve(
        V.integrate_bilinear_form(advection), V.solution_tensor(), b
    )
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_dense), atol=1e-7)


def test_tet_quality_handles_degenerate_cells():
    from pytorch_fem_solver_tpu.mesh import tet_quality_report

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0], [0, 0, 1.0]]
    )
    tets = np.array([[0, 1, 2, 3], [0, 1, 2, 4]])  # first is coplanar
    r = tet_quality_report(verts, tets)
    assert r["max_radius_edge"] == np.inf
    assert r["min_volume"] == 0.0
    assert abs(r["total_volume"] - 1.0 / 6.0) < 1e-12
