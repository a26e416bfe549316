"""3D tetrahedral path: quadrature, topology, assembly, convergence.

The reference library is 2D-only (its element layer stops at
``torch_fem/element/element_tri.py``); the 3D tier is a beyond-reference
extension, validated here against analytic monomial integrals, mesh
invariants (Euler characteristic, manifoldness, oriented normals), the P1
patch test, and manufactured-solution convergence rates.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet, tetrahedron_rule
from pytorch_fem_solver_tpu.element.quadrature import TET_RULE_ORDERS
from pytorch_fem_solver_tpu.mesh import MeshTet, box, unit_cube


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def mass_form(basis):
    return basis.v @ jnp.matrix_transpose(basis.v)


def exact_u(p):
    return (
        jnp.sin(np.pi * p[..., 0:1])
        * jnp.sin(np.pi * p[..., 1:2])
        * jnp.sin(np.pi * p[..., 2:3])
    )


def load_form(basis):
    p = basis.integration_points
    return 3 * np.pi**2 * exact_u(p) * basis.v


# -- quadrature ---------------------------------------------------------------


def test_tet_quadrature_polynomial_exactness():
    """Each degree-d rule integrates all monomials x^a y^b z^c, a+b+c <= d.

    Exact value over the reference tet: a! b! c! / (a+b+c+3)!; our weights are
    normalized (sum to 1), so multiply by the reference volume 1/6.
    """
    for order in TET_RULE_ORDERS:
        nodes, weights = tetrahedron_rule(order)
        assert abs(weights.sum() - 1.0) < 1e-12
        for a in range(order + 1):
            for b in range(order + 1 - a):
                for c in range(order + 1 - a - b):
                    approx = (1.0 / 6.0) * (
                        weights
                        * nodes[:, 0] ** a
                        * nodes[:, 1] ** b
                        * nodes[:, 2] ** c
                    ).sum()
                    exact = (
                        math.factorial(a)
                        * math.factorial(b)
                        * math.factorial(c)
                        / math.factorial(a + b + c + 3)
                    )
                    assert abs(approx - exact) < 1e-14, (order, a, b, c)


def test_tet_quadrature_unknown_order_raises():
    with pytest.raises(NotImplementedError):
        tetrahedron_rule(9)


# -- mesh / topology ----------------------------------------------------------


@pytest.fixture(scope="module")
def cube_mesh():
    return MeshTet(unit_cube(3))


def test_box_counts_and_orientation():
    n = 3
    t = unit_cube(n)
    assert t["vertices"].shape == ((n + 1) ** 3, 3)
    assert t["tetrahedra"].shape == (6 * n**3, 4)
    p = t["vertices"][t["tetrahedra"]]
    det = np.linalg.det((p[:, 1:] - p[:, [0]]).transpose(0, 2, 1))
    assert (det > 0).all()
    # the 6-tet Kuhn subdivision tiles each cube exactly
    assert abs(det.sum() / 6.0 - 1.0) < 1e-12


def test_tet_topology_invariants(cube_mesh):
    mesh = cube_mesh
    n_v = mesh.n_vertices
    n_t = mesh.n_cells
    n_f = int(mesh["faces", "vertices"].shape[0])
    n_e = int(mesh["edges", "vertices"].shape[0])
    # Euler characteristic of a ball: V - E + F - T = 1
    assert n_v - n_e + n_f - n_t == 1
    # interior + boundary faces partition the unique faces
    n_fi = mesh.n_interior_faces
    n_fb = int(mesh["boundary_faces", "vertices"].shape[0])
    assert n_fi + n_fb == n_f
    # each tet contributes 4 faces; interior shared by 2
    assert 2 * n_fi + n_fb == 4 * n_t
    # boundary of the cube: each of the 6 square sides has 2*n^2 triangles
    assert n_fb == 6 * 2 * 3**2


def test_tet_interior_face_normals(cube_mesh):
    mesh = cube_mesh
    normals = np.asarray(mesh["interior_faces", "normals"]).reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, atol=1e-12)
    # oriented from first adjacent cell's centroid toward the second's
    cells = np.asarray(mesh["interior_faces", "cells"])
    centroids = np.asarray(mesh["cells", "coordinates"]).mean(axis=1)
    d = centroids[cells[:, 1]] - centroids[cells[:, 0]]
    assert ((d * normals).sum(axis=1) > 0).all()


def test_tet_boundary_markers(cube_mesh):
    coords = np.asarray(cube_mesh["vertices", "coordinates"])
    markers = np.asarray(cube_mesh["vertices", "markers"]).reshape(-1)
    on_boundary = ((coords < 1e-12) | (coords > 1 - 1e-12)).any(axis=1)
    np.testing.assert_array_equal(markers.astype(bool), on_boundary)


def test_nonuniform_box():
    mesh = MeshTet(box(2, 3, 1, x1=2.0, y1=3.0, z1=0.5))
    vol = float(
        jnp.sum(
            fem.Basis(mesh, ElementTet(1, 1)).integrate_functional(
                lambda basis: jnp.ones_like(basis.v[..., :1, :])
            )
        )
    )
    assert abs(vol - 2.0 * 3.0 * 0.5) < 1e-12


# -- assembly -----------------------------------------------------------------


@pytest.fixture(scope="module")
def cube_basis(cube_mesh):
    return fem.Basis(cube_mesh, ElementTet(polynomial_order=1, integration_order=2))


def test_tet_stiffness_invariants(cube_basis):
    A = np.asarray(cube_basis.integrate_bilinear_form(stiffness_form))
    np.testing.assert_allclose(A, A.T, atol=1e-13)
    np.testing.assert_allclose(A.sum(axis=1), 0.0, atol=1e-12)


def test_tet_mass_total_is_volume(cube_basis):
    M = np.asarray(cube_basis.integrate_bilinear_form(mass_form))
    assert abs(M.sum() - 1.0) < 1e-13


def test_tet_p1_patch_test(cube_basis):
    """A globally linear exact solution is reproduced to machine precision."""
    V = cube_basis
    coords = V._coords4global_dofs
    u_exact = (
        2.0 + 3.0 * coords[..., 0:1] - 1.5 * coords[..., 1:2] + 0.5 * coords[..., 2:3]
    )
    A = V.integrate_bilinear_form(stiffness_form)
    u = V.solve(A, u_exact, jnp.zeros_like(u_exact))
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_exact), atol=1e-11)


def test_tet_p2_dof_layout(cube_mesh):
    V = fem.Basis(cube_mesh, ElementTet(polynomial_order=2, integration_order=4))
    n_v = cube_mesh.n_vertices
    n_e = int(cube_mesh["edges", "vertices"].shape[0])
    assert V._coords4global_dofs.shape[-2] == n_v + n_e
    assert V._global_dofs4elements.shape == (cube_mesh.n_cells, 10)
    # midpoint coordinates actually sit at edge midpoints
    verts = np.asarray(cube_mesh["vertices", "coordinates"])
    edges = np.asarray(cube_mesh["edges", "vertices"])
    np.testing.assert_allclose(
        np.asarray(V._coords4global_dofs)[n_v:],
        verts[edges].mean(axis=1),
        atol=1e-14,
    )


def test_tet_p2_partition_of_unity(cube_mesh):
    V = fem.Basis(cube_mesh, ElementTet(polynomial_order=2, integration_order=4))
    # sum of shape functions = 1 and gradients sum to 0 at every quad point
    np.testing.assert_allclose(
        np.asarray(V.v.sum(axis=-2)), 1.0, atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(V.v_grad.sum(axis=-2)), 0.0, atol=1e-12
    )


# -- solve + convergence ------------------------------------------------------


def _solve_poisson(n, order, integration_order):
    mesh = MeshTet(unit_cube(n))
    V = fem.Basis(mesh, ElementTet(order, integration_order))
    A = V.integrate_bilinear_form(stiffness_form)
    b = V.integrate_linear_form(load_form)
    u = V.solve(A, V.solution_tensor(), b)
    uh, _ = V.interpolate(V, u)
    diff2 = (uh - exact_u(V.integration_points)) ** 2
    err = float(jnp.sqrt(jnp.sum(V.integrate_functional(lambda basis: diff2))))
    return V, u, b, err


def test_tet_p1_convergence():
    _, _, _, e1 = _solve_poisson(3, 1, 2)
    _, _, _, e2 = _solve_poisson(6, 1, 2)
    assert math.log2(e1 / e2) > 1.7


def test_tet_p2_convergence():
    _, _, _, e1 = _solve_poisson(2, 2, 4)
    _, _, _, e2 = _solve_poisson(4, 2, 4)
    assert math.log2(e1 / e2) > 2.7


def test_tet_iterative_matches_dense():
    mesh = MeshTet(unit_cube(4))
    V = fem.Basis(mesh, ElementTet(1, 2))
    A = V.integrate_bilinear_form(stiffness_form)
    b = V.integrate_linear_form(load_form)
    u_dense = V.solve(A, V.solution_tensor(), b)
    local = V.integrate_bilinear_form_local(stiffness_form)
    for method in ("ell", "segment", "bsr"):
        u, info = V.solve_iterative(
            local, b, tol=1e-12, method=method, return_info=True
        )
        assert bool(info.converged), method
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(u_dense), atol=1e-9, err_msg=method
        )
