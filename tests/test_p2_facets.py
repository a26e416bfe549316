"""P2 facet bases: edge/face DOF maps aligned with the cell P2 space.

Beyond the reference (whose facet DOF map is a flagged-wrong placeholder,
/root/reference/torch_fem/basis/interior_edges_basis.py:20-23, and whose
P2 is commented out): facet bases carry vertex + edge-midpoint DOFs with
the SAME global numbering as ``Basis`` P2, so Neumann/Robin surface terms
assemble directly into P2 systems, in 2D and 3D. Also covers the mixed-BC
Dirichlet rule for midpoints (only edges with both endpoints marked are
constrained).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube


def stiffness(b):
    return b.v_grad @ jnp.matrix_transpose(b.v_grad)


def test_p2_boundary_edges_partition_of_unity():
    mesh = fem.MeshTri(fem.unit_square(n=4))
    Vb = fem.BoundaryEdgesBasis(mesh, fem.ElementLine(2, 3))
    V = fem.Basis(mesh, fem.ElementTri(2, 3))
    assert Vb.n_dofs == V.n_dofs
    b = Vb.integrate_linear_form(lambda b_: b_.v)
    assert abs(float(b.sum()) - 4.0) < 1e-12  # perimeter
    nz = np.flatnonzero(np.asarray(b).reshape(-1) != 0)
    marks = np.asarray(V._nodes4boundary_dofs).reshape(-1)
    assert (marks[nz] != 0).all()


def test_p2_interior_edges_quadratic_load_oracle():
    """P2 edge load with a quadratic weight integrates exactly: sum of
    the assembled vector equals the total weighted edge length."""
    mesh = fem.MeshTri(fem.unit_square(n=3))
    Vi = fem.InteriorEdgesBasis(mesh, fem.ElementLine(2, 4))

    def w(p):
        return p[..., 0:1] ** 2 + 2.0 * p[..., 1:2]

    b = Vi.integrate_linear_form(lambda b_: w(b_.integration_points) * b_.v)
    total = float(
        np.asarray(
            Vi.integrate_functional(lambda b_: w(b_.integration_points))
        ).sum()
    )
    assert abs(float(b.sum()) - total) < 1e-12


def test_p2_boundary_faces_partition_of_unity_3d():
    mesh = MeshTet(unit_cube(2))
    Vb = fem.BoundaryFacesBasis(mesh, fem.ElementTriSurface(2, 3))
    V = fem.Basis(mesh, ElementTet(2, 2))
    assert Vb.n_dofs == V.n_dofs
    b = Vb.integrate_linear_form(lambda b_: b_.v)
    assert abs(float(b.sum()) - 6.0) < 1e-12  # cube surface area
    nz = np.flatnonzero(np.asarray(b).reshape(-1) != 0)
    marks = np.asarray(V._nodes4boundary_dofs).reshape(-1)
    assert (marks[nz] != 0).all()


def test_p2_mixed_neumann_dirichlet_exact_2d():
    """-lap(u) = -2 with u* = x^2 + y: Dirichlet on x=0 only, Neumann data
    assembled through the P2 BoundaryEdgesBasis. P2 reproduces the
    quadratic exactly — this fails if Neumann-edge midpoints are wrongly
    constrained (the mixed-BC midpoint Dirichlet rule) or if the facet DOF
    numbering disagrees with the cell basis."""
    tri = fem.unit_square(n=6)
    v = np.asarray(tri["vertices"])
    markers = (np.abs(v[:, 0]) < 1e-12).astype(np.int64).reshape(-1, 1)
    mesh = fem.MeshTri(dict(tri, vertex_markers=markers))
    V = fem.Basis(mesh, fem.ElementTri(2, 3))
    Vb = fem.BoundaryEdgesBasis(mesh, fem.ElementLine(2, 3))

    A = V.integrate_bilinear_form(stiffness)
    b_vol = V.integrate_linear_form(lambda b_: -2.0 * b_.v)

    def g_form(b_):
        x = b_.integration_points[..., 0:1]
        y = b_.integration_points[..., 1:2]
        # outward du/dn of u = x^2 + y on the unit square
        g = jnp.where(
            x > 1 - 1e-9,
            2.0 * x,
            jnp.where(y > 1 - 1e-9, 1.0, jnp.where(y < 1e-9, -1.0, 0.0)),
        )
        return g * b_.v

    b = b_vol + Vb.integrate_linear_form(g_form)
    coords = np.asarray(V._coords4global_dofs)
    exact = jnp.asarray(
        (coords[:, 0] ** 2 + coords[:, 1]).reshape(-1, 1)
    )
    u_bc, rhs = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-10)


def test_p2_mixed_neumann_dirichlet_exact_3d():
    """Same construction in 3D: u* = x^2 + y + z on the unit cube,
    Dirichlet on x=0, Neumann via the P2 BoundaryFacesBasis."""
    tri = unit_cube(2)
    v = np.asarray(tri["vertices"])
    markers = (np.abs(v[:, 0]) < 1e-12).astype(np.int64).reshape(-1, 1)
    mesh = MeshTet(dict(tri, vertex_markers=markers))
    V = fem.Basis(mesh, ElementTet(2, 3))
    Vb = fem.BoundaryFacesBasis(mesh, fem.ElementTriSurface(2, 3))

    A = V.integrate_bilinear_form(stiffness)
    b_vol = V.integrate_linear_form(lambda b_: -2.0 * b_.v)

    def g_form(b_):
        p = b_.integration_points
        x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
        eps = 1e-9
        g = jnp.where(
            x > 1 - eps,
            2.0 * x,
            jnp.where(y > 1 - eps, 1.0, 0.0)
            + jnp.where(y < eps, -1.0, 0.0)
            + jnp.where(z > 1 - eps, 1.0, 0.0)
            + jnp.where(z < eps, -1.0, 0.0),
        )
        return g * b_.v

    b = b_vol + Vb.integrate_linear_form(g_form)
    coords = np.asarray(V._coords4global_dofs)
    exact = jnp.asarray(
        (coords[:, 0] ** 2 + coords[:, 1] + coords[:, 2]).reshape(-1, 1)
    )
    u_bc, rhs = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-9)


def test_p2_midpoint_dirichlet_rule():
    """Midpoints are constrained only on edges with BOTH endpoints marked;
    full boundary markers reduce to the plain boundary mask."""
    tri = fem.unit_square(n=4)
    v = np.asarray(tri["vertices"])
    # full markers: every boundary-edge midpoint constrained
    mesh_full = fem.MeshTri(tri)
    V_full = fem.Basis(mesh_full, fem.ElementTri(2, 2))
    n_v = v.shape[0]
    marks_full = np.asarray(V_full._nodes4boundary_dofs).reshape(-1)
    edge_marks = np.asarray(mesh_full["edges", "markers"]).reshape(-1)
    np.testing.assert_array_equal(
        marks_full[n_v:] != 0, edge_marks != 0
    )
    # partial markers (x=0 only): only x=0 edges' midpoints constrained
    markers = (np.abs(v[:, 0]) < 1e-12).astype(np.int64).reshape(-1, 1)
    mesh_part = fem.MeshTri(dict(tri, vertex_markers=markers))
    V_part = fem.Basis(mesh_part, fem.ElementTri(2, 2))
    coords = np.asarray(V_part._coords4global_dofs)
    marks = np.asarray(V_part._nodes4boundary_dofs).reshape(-1)
    mid_constrained = marks[n_v:] != 0
    mid_on_x0 = np.abs(coords[n_v:, 0]) < 1e-12
    np.testing.assert_array_equal(mid_constrained, mid_on_x0)


def test_p3_mixed_neumann_dirichlet_exact_2d():
    """P3 facet bases: u* = x^3 + y with Dirichlet on x=0 only and Neumann
    data assembled through the P3 BoundaryEdgesBasis reproduces exactly
    (edge-DOF orientation and the cell-P3 numbering agree)."""
    tri = fem.unit_square(n=4)
    v = np.asarray(tri["vertices"])
    markers = (np.abs(v[:, 0]) < 1e-12).astype(np.int64).reshape(-1, 1)
    mesh = fem.MeshTri(dict(tri, vertex_markers=markers))
    V = fem.Basis(mesh, fem.ElementTri(3, 5))
    Vb = fem.BoundaryEdgesBasis(mesh, fem.ElementLine(3, 4))
    assert Vb.n_dofs == V.n_dofs
    assert abs(float(Vb.integrate_linear_form(lambda b_: b_.v).sum()) - 4.0) < 1e-12

    A = V.integrate_bilinear_form(stiffness)
    b_vol = V.integrate_linear_form(
        lambda b_: -6.0 * b_.integration_points[..., 0:1] * b_.v
    )

    def g_form(b_):
        x = b_.integration_points[..., 0:1]
        y = b_.integration_points[..., 1:2]
        g = jnp.where(
            x > 1 - 1e-9,
            3.0 * x**2,
            jnp.where(y > 1 - 1e-9, 1.0, jnp.where(y < 1e-9, -1.0, 0.0)),
        )
        return g * b_.v

    b = b_vol + Vb.integrate_linear_form(g_form)
    coords = np.asarray(V._coords4global_dofs)
    exact = jnp.asarray((coords[:, 0] ** 3 + coords[:, 1]).reshape(-1, 1))
    u_bc, rhs = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-10)


def test_p3_mixed_neumann_dirichlet_exact_3d():
    """Same construction through the P3 BoundaryFacesBasis on tets (edge
    pairs + the face's own bubble DOF in the tet-P3 numbering)."""
    tri = unit_cube(2)
    v = np.asarray(tri["vertices"])
    markers = (np.abs(v[:, 0]) < 1e-12).astype(np.int64).reshape(-1, 1)
    mesh = MeshTet(dict(tri, vertex_markers=markers))
    V = fem.Basis(mesh, ElementTet(3, 4))
    Vb = fem.BoundaryFacesBasis(mesh, fem.ElementTriSurface(3, 4))
    assert Vb.n_dofs == V.n_dofs
    assert abs(float(Vb.integrate_linear_form(lambda b_: b_.v).sum()) - 6.0) < 1e-12

    A = V.integrate_bilinear_form(stiffness)
    b_vol = V.integrate_linear_form(
        lambda b_: -6.0 * b_.integration_points[..., 0:1] * b_.v
    )

    def g_form(b_):
        p = b_.integration_points
        x, y = p[..., 0:1], p[..., 1:2]
        eps = 1e-9
        g = jnp.where(
            x > 1 - eps,
            3.0 * x**2,
            jnp.where(y > 1 - eps, 1.0, 0.0)
            + jnp.where(y < eps, -1.0, 0.0),
        )
        return g * b_.v

    b = b_vol + Vb.integrate_linear_form(g_form)
    coords = np.asarray(V._coords4global_dofs)
    exact = jnp.asarray((coords[:, 0] ** 3 + coords[:, 1]).reshape(-1, 1))
    u_bc, rhs = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-10)


def test_p4_facet_raises():
    mesh = fem.MeshTri(fem.unit_square(n=2))
    with pytest.raises(NotImplementedError):
        fem.InteriorEdgesBasis(mesh, fem.ElementLine(4, 3))
