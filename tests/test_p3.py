"""P3 (cubic) triangle elements: beyond the reference's P1 (+ dead-code P2).

Validates the cubic Lagrange layout (3 vertices + 2 globally-oriented DOFs
per unique edge + 1 barycenter bubble per cell): partition of unity, exact
reproduction of cubics through the dense AND matrix-free solve paths,
O(h^3) H1 convergence, and cross-edge continuity of the oriented edge DOFs
via two-sided traces.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem

PI = math.pi


def a_form(b):
    return b.v_grad @ jnp.matrix_transpose(b.v_grad)


def test_p3_dof_layout_and_partition_of_unity():
    mesh = fem.MeshTri(fem.unit_square(n=4))
    V = fem.Basis(mesh, fem.ElementTri(3, 5))
    nv = mesh["vertices", "coordinates"].shape[0]
    ne = mesh["edges", "vertices"].shape[0]
    nt = mesh["cells", "vertices"].shape[0]
    assert V.n_dofs == nv + 2 * ne + nt
    v = np.asarray(V.v)
    assert np.abs(v.sum(-2) - 1.0).max() < 1e-13
    grads = np.asarray(V.v_grad)
    assert np.abs(grads.sum(-2)).max() < 1e-12  # gradients sum to zero
    # interior (bubble) DOFs are never Dirichlet
    marks = np.asarray(V._nodes4boundary_dofs).reshape(-1)
    assert (marks[nv + 2 * ne:] == 0).all()


def test_p3_reproduces_cubic_exactly_both_solvers():
    """u* = x^3 + y^3 is in the P3 space: the Galerkin solution with
    lifted Dirichlet data reproduces it to machine precision, on the dense
    and the matrix-free BSR paths (which also proves the global edge-DOF
    orientation agrees between adjacent cells)."""
    mesh = fem.MeshTri(fem.unit_square(n=4))
    V = fem.Basis(mesh, fem.ElementTri(3, 5))
    coords = np.asarray(V._coords4global_dofs)

    def rhs(p):
        return -(6 * p[..., 0:1] + 6 * p[..., 1:2])

    A = V.integrate_bilinear_form(a_form)
    b = V.integrate_linear_form(
        lambda b_: rhs(b_.integration_points) * b_.v
    )
    exact = jnp.asarray((coords[:, 0] ** 3 + coords[:, 1] ** 3).reshape(-1, 1))
    u_bc, rhs_l = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs_l)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-12)
    u_it = V.solve_iterative(
        V.integrate_bilinear_form_local(a_form),
        rhs_l,
        solution=u_bc,
        tol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(u_it), np.asarray(u), atol=1e-11
    )


def test_p3_h1_convergence_third_order():
    errs = []
    for n in (4, 8):
        mesh = fem.MeshTri(fem.unit_square(n=n))
        V = fem.Basis(mesh, fem.ElementTri(3, 5))

        def l(b_):
            x = b_.integration_points[..., 0:1]
            y = b_.integration_points[..., 1:2]
            return 2 * PI**2 * jnp.sin(PI * x) * jnp.sin(PI * y) * b_.v

        u = V.solve(
            V.integrate_bilinear_form(a_form),
            V.solution_tensor(),
            V.integrate_linear_form(l),
        )
        uh, ug = V.interpolate(V, u)

        def h1(b_):
            x = b_.integration_points[..., 0:1]
            y = b_.integration_points[..., 1:2]
            return (
                (uh - jnp.sin(PI * x) * jnp.sin(PI * y)) ** 2
                + (ug[..., 0:1] - PI * jnp.cos(PI * x) * jnp.sin(PI * y)) ** 2
                + (ug[..., 1:2] - PI * jnp.sin(PI * x) * jnp.cos(PI * y)) ** 2
            )

        errs.append(float(jnp.sqrt(V.integrate_functional(h1).sum())))
    rate = math.log2(errs[0] / errs[1])
    assert 2.7 < rate < 3.3, (errs, rate)


def test_p3_two_sided_traces_continuous():
    """A P3 DOF vector evaluated from both sides of every interior edge
    agrees (cross-cell continuity of the oriented edge DOFs)."""
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.Basis(mesh, fem.ElementTri(3, 4))
    Ve = fem.InteriorEdgesBasis(mesh, fem.ElementLine(1, 4))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((V.n_dofs, 1)))
    vals, _ = V.interpolate(Ve, u)
    vals = np.asarray(vals)  # (Ei, 2, q, 1, 1)
    np.testing.assert_allclose(vals[:, 0], vals[:, 1], atol=1e-11)


def test_p3_tet_layout_and_cubic_exactness():
    """3D P3: 4 vertices + 2 oriented DOFs per edge + 1 face-barycenter
    node = 20 local DOFs; u* = x^3 + y^3 + z^3 reproduces exactly through
    both solve paths."""
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    mesh = MeshTet(unit_cube(2))
    V = fem.Basis(mesh, ElementTet(3, 4))
    nv = mesh["vertices", "coordinates"].shape[0]
    ne = mesh["edges", "vertices"].shape[0]
    nf = mesh["faces", "vertices"].shape[0]
    assert V.n_dofs == nv + 2 * ne + nf
    assert V._global_dofs4elements.shape[-1] == 20
    assert np.abs(np.asarray(V.v).sum(-2) - 1.0).max() < 1e-13

    coords = np.asarray(V._coords4global_dofs)
    A = V.integrate_bilinear_form(a_form)
    b = V.integrate_linear_form(
        lambda b_: -6.0
        * b_.integration_points.sum(-1, keepdims=True)
        * b_.v
    )
    exact = jnp.asarray(
        (coords**3).sum(axis=1, keepdims=True)
    )
    u_bc, rhs = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-12)
    u_it = V.solve_iterative(
        V.integrate_bilinear_form_local(a_form),
        rhs,
        solution=u_bc,
        tol=1e-13,
    )
    np.testing.assert_allclose(np.asarray(u_it), np.asarray(u), atol=1e-10)


def test_p3_tet_h1_convergence_third_order():
    import math as _m

    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    errs = []
    for n in (2, 4):
        mesh = MeshTet(unit_cube(n))
        V = fem.Basis(mesh, ElementTet(3, 5))

        def l(b_):
            p = b_.integration_points
            s = (
                jnp.sin(PI * p[..., 0:1])
                * jnp.sin(PI * p[..., 1:2])
                * jnp.sin(PI * p[..., 2:3])
            )
            return 3 * PI**2 * s * b_.v

        u = V.solve(
            V.integrate_bilinear_form(a_form),
            V.solution_tensor(),
            V.integrate_linear_form(l),
        )
        uh, ug = V.interpolate(V, u)

        def h1(b_):
            p = b_.integration_points
            x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
            s, c = jnp.sin, jnp.cos
            ex = s(PI * x) * s(PI * y) * s(PI * z)
            return (
                (uh - ex) ** 2
                + (ug[..., 0:1] - PI * c(PI * x) * s(PI * y) * s(PI * z)) ** 2
                + (ug[..., 1:2] - PI * s(PI * x) * c(PI * y) * s(PI * z)) ** 2
                + (ug[..., 2:3] - PI * s(PI * x) * s(PI * y) * c(PI * z)) ** 2
            )

        errs.append(float(jnp.sqrt(V.integrate_functional(h1).sum())))
    rate = _m.log2(errs[0] / errs[1])
    assert 2.6 < rate < 3.3, (errs, rate)


def test_p3_vector_basis_cubic_exact():
    """The vector lift is order-generic: P3 linear elasticity reproduces
    the cubic displacement u* = (x^3, y^3) exactly."""
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.VectorBasis(mesh, fem.ElementTri(3, 5))
    mu, lam = 1.0, 1.5

    def elasticity(b_):
        g = b_.v_grad
        eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
        div = jnp.trace(g, axis1=-2, axis2=-1)
        return (
            2 * mu * jnp.einsum("...icd,...jcd->...ij", eps, eps)
            + lam * div[..., :, None] * div[..., None, :]
        )

    def bodyf(b_):
        p = b_.integration_points
        f = -jnp.concatenate(
            [
                (2 * mu + lam) * 6 * p[..., 0:1],
                (2 * mu + lam) * 6 * p[..., 1:2],
            ],
            axis=-1,
        )
        return (f * b_.v).sum(-1, keepdims=True)

    A = V.integrate_bilinear_form(elasticity)
    b = V.integrate_linear_form(bodyf)
    coords = np.asarray(V._coords4global_dofs)
    comp = np.arange(coords.shape[0]) % 2  # interleaved node-major layout
    exact = jnp.asarray(
        (coords[np.arange(coords.shape[0]), comp] ** 3).reshape(-1, 1)
    )
    u_bc, rhs = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-12)


def test_p3_fracture_network_cubic_exact_across_traces():
    """P3 on the glued two-fracture network: u* = y^2 (1 - y) is in-space,
    continuous across the trace with zero conormal flux, and reproduces
    exactly — shared oriented edge DOFs glue cubics across fractures
    (P2 on the same problem errs at ~6.5e-4, so the test discriminates)."""
    from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network

    f1 = [[-1, 0, 0], [1, 0, 0], [1, 1, 0], [-1, 1, 0]]
    f2 = [[0, 0, -1], [0, 0, 1], [0, 1, 1], [0, 1, -1]]
    mesh = build_fracture_network([f1, f2], h=0.3)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(3, 5))
    assert np.abs(np.asarray(V.v).sum(-2) - 1.0).max() < 1e-13

    def exact3(c):
        y = c[..., 1:2]
        return y**2 * (1 - y)

    A = V.integrate_bilinear_form(a_form)
    b = V.integrate_linear_form(
        lambda b_: -(2 - 6 * b_.integration_points[..., 1:2]) * b_.v
    )
    coords = np.asarray(V._coords4global_dofs)
    exact = jnp.asarray(np.asarray(exact3(coords)).reshape(-1, 1))
    u_bc, rhs = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-12)
    u_it = V.solve_iterative(
        V.integrate_bilinear_form_local(a_form),
        rhs,
        solution=u_bc,
        tol=1e-13,
    )
    np.testing.assert_allclose(np.asarray(u_it), np.asarray(u), atol=1e-11)


def test_p4_rejected():
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    with pytest.raises(NotImplementedError):
        fem.Basis(MeshTet(unit_cube(1)), ElementTet(4, 3))
    with pytest.raises(NotImplementedError):
        fem.Basis(fem.MeshTri(fem.unit_square(n=2)), fem.ElementTri(4, 5))


def test_p3_batched_fracture_basis_cubic_exact_across_trace():
    """P3 on the BATCHED FractureBasis (previously P2-max): the glued
    global triangulation shares both oriented cubic edge DOFs on trace
    edges, so u* = y^2 (1 - y) reproduces exactly across the two-fracture
    intersection — same discriminating problem as the flat-network test."""
    tri = fem.rectangle(4, 2, x0=-1.0, x1=1.0, y0=0.0, y1=1.0)
    anchors = np.array([[[-1.0, 0.0], [1.0, 0.0], [-1.0, 1.0]]] * 2)
    f3d = np.array(
        [
            [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 1.0, 0.0]],
            [[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 1.0, -1.0]],
        ]
    )
    mesh = fem.FracturesTri([tri, tri], f3d, anchor_vertices_2d=anchors)
    V = fem.FractureBasis(mesh, fem.ElementTri(3, 5))
    assert np.abs(np.asarray(V.v).sum(-2) - 1.0).max() < 1e-12

    # trace edges exist and their cubic edge DOFs are genuinely shared:
    # total DOFs < the unglued sum (2 fractures x per-fracture P3 count)
    g = V.global_triangulation
    assert np.asarray(g["traces_global_edges_idx"]).size > 0
    n_v2d = tri["vertices"].shape[0]
    n_e2d = np.asarray(mesh["edges", "vertices"]).shape[-2]
    n_t2d = tri["triangles"].shape[0]
    unglued = 2 * (n_v2d + 2 * n_e2d + n_t2d)
    assert V.n_dofs < unglued

    def exact3(c):
        y = c[..., 1:2]
        return y * y * (1 - y)

    A = V.integrate_bilinear_form(a_form)
    b = V.integrate_linear_form(
        lambda b_: -(2 - 6 * b_.integration_points[..., 1:2]) * b_.v
    )
    coords = np.asarray(V._coords4global_dofs)
    exact = jnp.asarray(np.asarray(exact3(coords)).reshape(-1, 1))
    u_bc, rhs = V.dirichlet_lift(A, b, exact)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(exact), atol=1e-11)
