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
from pytorch_fem_solver_tpu.mesh import (
    MeshTet,
    box,
    dorfler_mark,
    fichera_corner,
    refine_adaptive_tet,
    tet_quality_report,
    unit_cube,
)


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


# -- face bases (3D facet machinery) -----------------------------------------


def test_face_functionals_integrate_areas(cube_mesh):
    Vf = fem.InteriorFacesBasis(cube_mesh, fem.ElementTriSurface(1, 2))
    tot = float(
        Vf.integrate_functional(
            lambda b: jnp.ones_like(b.integration_points[..., :1])
        ).sum()
    )
    expect = float(np.asarray(cube_mesh["interior_faces", "area"]).sum())
    assert abs(tot - expect) < 1e-12
    Vb = fem.BoundaryFacesBasis(cube_mesh, fem.ElementTriSurface(1, 2))
    surf = float(
        Vb.integrate_functional(
            lambda b: jnp.ones_like(b.integration_points[..., :1])
        ).sum()
    )
    assert abs(surf - 6.0) < 1e-12


def test_face_basis_requires_surface_element(cube_mesh):
    import pytest as _pytest

    from pytorch_fem_solver_tpu.element import ElementTri

    with _pytest.raises(TypeError):
        fem.InteriorFacesBasis(cube_mesh, ElementTri(1, 2))


def test_two_sided_face_traces_of_linear_function(cube_mesh):
    V = fem.Basis(cube_mesh, ElementTet(1, 2))
    Vf = fem.InteriorFacesBasis(cube_mesh, fem.ElementTriSurface(1, 2))
    coords = np.asarray(V._coords4global_dofs)
    u = jnp.asarray(
        (2.0 * coords[:, 0] - 0.7 * coords[:, 1] + 0.4 * coords[:, 2] + 0.3)
        .reshape(-1, 1)
    )
    vals, grads = V.interpolate(Vf, u)
    pts = np.asarray(Vf.integration_points)  # (Fi, q, 1, 3)
    exact = 2.0 * pts[..., 0:1] - 0.7 * pts[..., 1:2] + 0.4 * pts[..., 2:3] + 0.3
    v = np.asarray(vals)  # (Fi, 2, q, 1, 1)
    for side in range(2):
        np.testing.assert_allclose(
            v[:, side, :, 0, :], exact[:, :, 0, :], atol=1e-12
        )
    g = np.asarray(grads)
    np.testing.assert_allclose(g[..., 0], 2.0, atol=1e-12)
    np.testing.assert_allclose(g[..., 1], -0.7, atol=1e-12)
    np.testing.assert_allclose(g[..., 2], 0.4, atol=1e-12)
    normals = np.asarray(cube_mesh["interior_faces", "normals"])
    jump = (g[:, 0, 0] * normals).sum(-1) - (g[:, 1, 0] * normals).sum(-1)
    np.testing.assert_allclose(jump, 0.0, atol=1e-12)


def test_face_normal_gradient_jump_closed_form(cube_mesh):
    """Flux jump of a random P1 function vs a per-cell NumPy gradient oracle."""
    V = fem.Basis(cube_mesh, ElementTet(1, 2))
    Vf = fem.InteriorFacesBasis(cube_mesh, fem.ElementTriSurface(1, 2))
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.normal(size=(cube_mesh.n_vertices, 1)))

    _, grads = V.interpolate(Vf, u)
    g = np.asarray(grads)  # (Fi, 2, 1, 1, 3)
    normals = np.asarray(cube_mesh["interior_faces", "normals"])  # (Fi, 1, 3)
    jump = (g[:, 0, 0] * normals).sum(-1) - (g[:, 1, 0] * normals).sum(-1)

    verts = np.asarray(cube_mesh["vertices", "coordinates"])
    tets = np.asarray(cube_mesh["cells", "vertices"])
    u_np = np.asarray(u).reshape(-1)
    gref = np.array(
        [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    cell_grad = np.zeros((tets.shape[0], 3))
    for c, tet in enumerate(tets):
        p = verts[tet]
        J = np.stack([p[1] - p[0], p[2] - p[0], p[3] - p[0]], axis=1)
        cell_grad[c] = u_np[tet] @ (gref @ np.linalg.inv(J))
    cells = np.asarray(cube_mesh["interior_faces", "cells"])
    n0 = normals[:, 0, :]
    expect = ((cell_grad[cells[:, 0]] - cell_grad[cells[:, 1]]) * n0).sum(-1)
    np.testing.assert_allclose(jump[:, 0], expect, atol=1e-11)


def test_neumann_surface_load_assembles():
    r"""b_N = \int_Gamma g v dS with g = 1: entries sum to the surface area
    and land only on boundary vertices."""
    mesh = MeshTet(unit_cube(3))
    Vb = fem.BoundaryFacesBasis(mesh, fem.ElementTriSurface(1, 2))
    bN = np.asarray(
        Vb.integrate_linear_form(lambda b: jnp.ones_like(b.v) * b.v)
    ).reshape(-1)
    assert abs(bN.sum() - 6.0) < 1e-12
    markers = np.asarray(mesh["vertices", "markers"]).reshape(-1)
    assert np.abs(bN[markers == 0]).max() == 0.0
    assert (bN[markers == 1] > 0).all()


# -- uniform red refinement ---------------------------------------------------


def test_refine_uniform_tet_counts_volume_markers():
    from pytorch_fem_solver_tpu.mesh import refine_uniform_tet
    from pytorch_fem_solver_tpu.mesh.topology import build_tet_topology

    t0 = unit_cube(2)
    t1 = refine_uniform_tet(t0)
    assert t1["tetrahedra"].shape == (8 * t0["tetrahedra"].shape[0], 4)
    p = t1["vertices"][t1["tetrahedra"]]
    det = np.linalg.det((p[:, 1:] - p[:, [0]]).transpose(0, 2, 1))
    assert (det > 0).all()
    assert abs(det.sum() / 6.0 - 1.0) < 1e-12
    # propagated markers == markers derived from fresh topology
    fresh = build_tet_topology(
        np.asarray(t1["vertices"]), np.asarray(t1["tetrahedra"])
    )["vertex_markers"]
    np.testing.assert_array_equal(np.asarray(t1["vertex_markers"]), fresh)
    # conforming (manifold) after refinement: MeshTet construction checks
    MeshTet(t1)


def test_refine_uniform_tet_shape_stable():
    """Shortest-diagonal octahedron split: the worst min/max-edge aspect
    must NOT degrade across levels (fixed-label diagonals + orientation
    relabels measured 0.41 -> 0.33 -> 0.24 per level before the fix)."""
    from pytorch_fem_solver_tpu.mesh import refine_uniform_tet

    def worst_aspect(t):
        p = np.asarray(t["vertices"])[np.asarray(t["tetrahedra"])]
        e = p[:, [[0, 1], [1, 2], [0, 2], [0, 3], [1, 3], [2, 3]]]
        L = np.linalg.norm(e[:, :, 1] - e[:, :, 0], axis=-1)
        return (L.min(1) / L.max(1)).min()

    t = unit_cube(1)
    aspects = [worst_aspect(t)]
    for _ in range(3):
        t = refine_uniform_tet(t)
        aspects.append(worst_aspect(t))
    assert min(aspects) > 0.95 * aspects[0], aspects


def test_refine_uniform_tet_convergence_family():
    from pytorch_fem_solver_tpu.mesh import refine_uniform_tet

    t = unit_cube(2)
    errs = []
    for _ in range(3):
        V = fem.Basis(MeshTet(t), ElementTet(1, 2))
        A = V.integrate_bilinear_form(stiffness_form)
        b = V.integrate_linear_form(load_form)
        u = V.solve(A, V.solution_tensor(), b)
        uh, _ = V.interpolate(V, u)
        d2 = (uh - exact_u(V.integration_points)) ** 2
        errs.append(
            float(jnp.sqrt(jnp.sum(V.integrate_functional(lambda b_: d2))))
        )
        t = refine_uniform_tet(t)
    assert math.log2(errs[1] / errs[2]) > 1.6, errs


# -- quality metrics ----------------------------------------------------------


def test_tet_quality_metrics():
    from pytorch_fem_solver_tpu.mesh import (
        refine_uniform_tet,
        tet_min_dihedral_angles,
        tet_quality_report,
    )

    # the regular tetrahedron's dihedral angle is arccos(1/3) ~ 70.53 deg
    reg = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1.0]])
    ang = tet_min_dihedral_angles(reg, np.array([[0, 1, 2, 3]]))
    np.testing.assert_allclose(ang, np.degrees(np.arccos(1 / 3)), atol=1e-9)

    t = unit_cube(2)
    r = tet_quality_report(t["vertices"], t["tetrahedra"])
    # Kuhn tets: min dihedral exactly 45 deg, radius-edge sqrt(3)/2
    assert abs(r["min_dihedral"] - 45.0) < 1e-9
    assert abs(r["max_radius_edge"] - np.sqrt(3) / 2) < 1e-9
    assert abs(r["total_volume"] - 1.0) < 1e-12

    # red refinement keeps quality bounded: the similarity classes settle
    # within two levels (45 -> 35.26 deg) and then stay exactly flat
    r2 = tet_quality_report(*(lambda d: (d["vertices"], d["tetrahedra"]))(
        refine_uniform_tet(t, 2)
    ))
    r3 = tet_quality_report(*(lambda d: (d["vertices"], d["tetrahedra"]))(
        refine_uniform_tet(t, 3)
    ))
    assert r3["min_dihedral"] >= r2["min_dihedral"] - 1e-9
    assert r3["min_dihedral"] > 30.0
    assert abs(r3["max_radius_edge"] - r2["max_radius_edge"]) < 1e-9


# -- a-posteriori estimator in 3D ---------------------------------------------


def test_tet_residual_jump_estimator_effectivity():
    """The residual + face-jump estimator is efficient and reliable in 3D:
    eta tracks the true H1 error within a bounded effectivity band across
    refinement, at the same decay rate."""
    results = []
    for n in (3, 6):
        mesh = MeshTet(unit_cube(n))
        V = fem.Basis(mesh, ElementTet(1, 2))
        Vf = fem.InteriorFacesBasis(mesh, fem.ElementTriSurface(1, 2))

        A = V.integrate_bilinear_form(stiffness_form)
        b = V.integrate_linear_form(load_form)
        u = V.solve(A, V.solution_tensor(), b)

        # true H1 error via quadrature
        uh, ugh = V.interpolate(V, u)
        pts = V.integration_points
        ge = jnp.concatenate(
            [
                np.pi * jnp.cos(np.pi * pts[..., 0:1])
                * jnp.sin(np.pi * pts[..., 1:2])
                * jnp.sin(np.pi * pts[..., 2:3]),
                np.pi * jnp.sin(np.pi * pts[..., 0:1])
                * jnp.cos(np.pi * pts[..., 1:2])
                * jnp.sin(np.pi * pts[..., 2:3]),
                np.pi * jnp.sin(np.pi * pts[..., 0:1])
                * jnp.sin(np.pi * pts[..., 1:2])
                * jnp.cos(np.pi * pts[..., 2:3]),
            ],
            axis=-1,
        )
        e2 = (uh - exact_u(pts)) ** 2 + ((ugh - ge) ** 2).sum(
            -1, keepdims=True
        )
        h1_err = float(jnp.sqrt(jnp.sum(V.integrate_functional(lambda b_: e2))))

        # bulk: h_T^2 ||f||_T^2 (P1: elementwise Laplacian vanishes)
        h_T = mesh["cells", "length"]
        bulk = np.asarray(
            V.integrate_functional(
                lambda b_: h_T**2
                * (3 * np.pi**2 * exact_u(b_.integration_points)) ** 2
            )
        ).reshape(-1)

        # face term: h_F [du_h/n]^2 with h_F ~ sqrt(area)
        _, ug_faces = V.interpolate(Vf, u)
        n_F = mesh["interior_faces", "normals"][..., None, :, :]
        h_F = jnp.sqrt(mesh["interior_faces", "area"])[..., None, :, :]

        def face_term(b_):
            jump = (ug_faces[:, 0] * n_F).sum(-1, keepdims=True) - (
                ug_faces[:, 1] * n_F
            ).sum(-1, keepdims=True)
            return h_F * jump**2

        per_face = np.asarray(Vf.integrate_functional(face_term)).reshape(-1)
        eta2 = bulk.copy()
        cells = np.asarray(mesh["interior_faces", "cells"])
        np.add.at(eta2, cells[:, 0], 0.5 * per_face)
        np.add.at(eta2, cells[:, 1], 0.5 * per_face)
        eta = float(np.sqrt(eta2.sum()))
        results.append((h1_err, eta))

    for h1_err, eta in results:
        effectivity = eta / h1_err
        assert 0.5 < effectivity < 30.0, (h1_err, eta)
    # eta decays at the same O(h) rate as the true H1 error
    rate_err = math.log2(results[0][0] / results[1][0])
    rate_eta = math.log2(results[0][1] / results[1][1])
    assert abs(rate_err - rate_eta) < 0.4, (rate_err, rate_eta)


# -- adaptive bisection in 3D --------------------------------------------------


def _tet_volumes(v, t):
    p = v[t]
    return np.linalg.det((p[:, 1:] - p[:, [0]]).transpose(0, 2, 1)) / 6.0


def _assert_conforming_tets(tri):
    """Orientation, no hanging nodes (every face in <= 2 tets, and split
    faces don't coexist with their parent), all vertices used."""
    v = np.asarray(tri["vertices"])
    t = np.asarray(tri["tetrahedra"])
    vols = _tet_volumes(v, t)
    assert (vols > 1e-15).all()
    faces = np.sort(
        t[:, [[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]]].reshape(-1, 3),
        axis=1,
    )
    _, counts = np.unique(faces, axis=0, return_counts=True)
    assert counts.max() <= 2
    used = np.zeros(v.shape[0], dtype=bool)
    used[t.ravel()] = True
    assert used.all()
    return vols.sum()


def test_refine_adaptive_tet_conforming_and_quality_stable():
    """Random marking over repeated rounds stays conforming, conserves
    volume exactly, and keeps element quality bounded (no degeneration)."""
    tri = unit_cube(2)
    v0 = _assert_conforming_tets(tri)
    q0 = tet_quality_report(tri["vertices"], tri["tetrahedra"])
    rng = np.random.default_rng(7)
    for _ in range(5):
        n_t = tri["tetrahedra"].shape[0]
        tri = refine_adaptive_tet(tri, rng.random(n_t) < 0.3)
        vtot = _assert_conforming_tets(tri)
        assert abs(vtot - v0) < 1e-12
    q = tet_quality_report(tri["vertices"], tri["tetrahedra"])
    # longest-edge bisection of the Kuhn mesh cycles through finitely many
    # similarity classes; the dihedral floor must not erode
    assert q["min_dihedral"] > 0.6 * q0["min_dihedral"]
    assert q["max_radius_edge"] < 3.0 * q0["max_radius_edge"]


def test_refine_adaptive_tet_marks_and_markers():
    """A single marked tet is actually split; closure splits only what
    conformity requires; boundary midpoints inherit the stronger label."""
    tri = unit_cube(1)
    n_t = tri["tetrahedra"].shape[0]
    marked = np.zeros(n_t, dtype=bool)
    marked[0] = True
    out = refine_adaptive_tet(tri, marked)
    assert out["tetrahedra"].shape[0] > n_t
    _assert_conforming_tets(out)
    # every new vertex is an edge midpoint; boundary-edge midpoints carry
    # the boundary label
    n_old = tri["vertices"].shape[0]
    new_v = out["vertices"][n_old:]
    new_m = out["vertex_markers"][n_old:].reshape(-1)
    on_surf = (
        (np.abs(new_v) < 1e-12) | (np.abs(new_v - 1.0) < 1e-12)
    ).any(axis=1)
    np.testing.assert_array_equal(new_m != 0, on_surf)
    # no marks -> identity
    same = refine_adaptive_tet(tri, np.zeros(n_t, dtype=bool))
    assert same["tetrahedra"].shape[0] == n_t
    with pytest.raises(ValueError):
        refine_adaptive_tet(tri, np.zeros(n_t + 1, dtype=bool))


def test_fichera_corner_mesh():
    """Fichera domain: volume 7, conforming, re-entrant faces marked."""
    tri = fichera_corner(2)
    vtot = _assert_conforming_tets(tri)
    assert abs(vtot - 7.0) < 1e-12
    # the origin (re-entrant corner) is a boundary vertex
    v = tri["vertices"]
    orig = np.flatnonzero((np.abs(v) < 1e-12).all(axis=1))
    assert orig.size == 1 and tri["vertex_markers"][orig[0]] != 0
    # a point on the re-entrant face interior is boundary too
    p = np.flatnonzero(
        (np.abs(v[:, 0]) < 1e-12) & (v[:, 1] > 0.2) & (v[:, 2] > 0.2)
        & (v[:, 1] < 0.8) & (v[:, 2] < 0.8)
    )
    assert p.size > 0 and (tri["vertex_markers"][p] != 0).all()


def test_fichera_adaptive_loop_concentrates_at_corner():
    """An estimator-driven adaptive loop on the Fichera corner refines
    where the singularity is: the refined mesh's smallest cells cluster at
    the re-entrant corner and the estimator decreases monotonically."""
    tri = fichera_corner(1)
    etas = []
    for _ in range(3):
        mesh = MeshTet(tri)
        V = fem.Basis(mesh, ElementTet(1, 2))
        Vf = fem.InteriorFacesBasis(mesh, fem.ElementTriSurface(1, 2))
        A = V.integrate_bilinear_form(stiffness_form)
        b = V.integrate_linear_form(lambda b_: b_.v)
        u = V.solve(A, V.solution_tensor(), b)

        h_T = mesh["cells", "length"]
        bulk = np.asarray(
            V.integrate_functional(lambda b_: h_T**2 * jnp.ones(1))
        ).reshape(-1)
        _, ug_faces = V.interpolate(Vf, u)
        n_F = mesh["interior_faces", "normals"][..., None, :, :]
        h_F = jnp.sqrt(mesh["interior_faces", "area"])[..., None, :, :]

        def face_term(b_):
            jump = (ug_faces[:, 0] * n_F).sum(-1, keepdims=True) - (
                ug_faces[:, 1] * n_F
            ).sum(-1, keepdims=True)
            return h_F * jump**2

        per_face = np.asarray(Vf.integrate_functional(face_term)).reshape(-1)
        eta2 = bulk.copy()
        cells = np.asarray(mesh["interior_faces", "cells"])
        np.add.at(eta2, cells[:, 0], 0.5 * per_face)
        np.add.at(eta2, cells[:, 1], 0.5 * per_face)
        etas.append(float(np.sqrt(eta2.sum())))
        tri = refine_adaptive_tet(tri, dorfler_mark(np.sqrt(eta2), 0.4))
        _assert_conforming_tets(tri)

    assert etas[-1] < etas[0], etas
    # smallest cells end up nearest the re-entrant corner
    v = np.asarray(tri["vertices"])
    t = np.asarray(tri["tetrahedra"])
    vols = _tet_volumes(v, t)
    centroids = v[t].mean(axis=1)
    dist = np.linalg.norm(centroids, axis=1)
    smallest = np.argsort(vols)[: max(4, t.shape[0] // 20)]
    assert np.median(dist[smallest]) < np.median(dist), (
        np.median(dist[smallest]),
        np.median(dist),
    )
