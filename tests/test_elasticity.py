"""Vector-valued basis + 2D linear elasticity (beyond the reference).

Test doctrine per SURVEY.md §4: (a) external/hand oracle for assembly (a
plain NumPy per-element loop here), (d) manufactured solution + convergence
rates, (c) self-consistency between solver paths, plus the vector-specific
preconditioner property (rigid-body-mode coarse space keeps CG iteration
counts essentially h-independent where constant coarse spaces degrade).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem

MU, LAM = 1.0, 1.5
PI = math.pi


def elasticity(b):
    g = b.v_grad
    eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
    div = jnp.trace(g, axis1=-2, axis2=-1)
    return (
        2 * MU * jnp.einsum("...icd,...jcd->...ij", eps, eps)
        + LAM * div[..., :, None] * div[..., None, :]
    )


def u_exact(x, y):
    return jnp.stack(
        [jnp.sin(PI * x) * jnp.sin(PI * y), x * (1 - x) * y * (1 - y)],
        axis=-1,
    )


def body_force(x, y):
    s, c = jnp.sin, jnp.cos
    f1 = MU * 2 * PI**2 * s(PI * x) * s(PI * y) + (MU + LAM) * (
        PI**2 * s(PI * x) * s(PI * y) - (1 - 2 * x) * (1 - 2 * y)
    )
    f2 = MU * (2 * y * (1 - y) + 2 * x * (1 - x)) - (MU + LAM) * (
        PI**2 * c(PI * x) * c(PI * y) - 2 * x * (1 - x)
    )
    return jnp.stack([f1, f2], axis=-1)


def load(b):
    x = b.integration_points[..., 0]
    y = b.integration_points[..., 1]
    return (b.v * body_force(x, y)).sum(-1, keepdims=True)


def numpy_elasticity_oracle(verts, cells):
    """Plain per-element P1 plane-strain assembly (independent loop code)."""
    n = len(verts)
    K = np.zeros((2 * n, 2 * n))
    gref = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    for tri in cells:
        p = verts[tri]
        J = np.stack([p[1] - p[0], p[2] - p[0]], axis=1)
        detJ = abs(np.linalg.det(J))
        gphys = gref @ np.linalg.inv(J)  # (3, 2)
        Ke = np.zeros((6, 6))
        for i in range(3):
            for ci in range(2):
                Gi = np.zeros((2, 2))
                Gi[ci] = gphys[i]
                Ei = 0.5 * (Gi + Gi.T)
                for j in range(3):
                    for cj in range(2):
                        Gj = np.zeros((2, 2))
                        Gj[cj] = gphys[j]
                        Ej = 0.5 * (Gj + Gj.T)
                        Ke[2 * i + ci, 2 * j + cj] = (
                            2 * MU * (Ei * Ej).sum()
                            + LAM * np.trace(Gi) * np.trace(Gj)
                        ) * detJ / 2
        idx = np.stack([2 * tri, 2 * tri + 1], axis=1).reshape(-1)
        K[np.ix_(idx, idx)] += Ke
    return K


def test_vector_assembly_matches_numpy_oracle():
    mesh = fem.MeshTri(fem.unit_square(n=4))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    A = np.asarray(V.integrate_bilinear_form(elasticity))
    K = numpy_elasticity_oracle(
        np.asarray(mesh["vertices", "coordinates"]),
        np.asarray(mesh["cells", "vertices"]),
    )
    assert np.abs(A - A.T).max() == 0.0
    np.testing.assert_allclose(A, K, atol=1e-13)


def test_vector_shape_tables():
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2), n_components=2)
    q = V.v.shape[0]
    assert V.v.shape == (q, 6, 2)
    assert V.v_grad.shape[-3:] == (6, 2, 2)
    assert V.n_dofs == 2 * np.asarray(mesh["vertices", "coordinates"]).shape[0]
    # interleaved layout: components of one node are adjacent DOFs
    dofs = np.asarray(V._global_dofs4elements)
    cells = np.asarray(mesh["cells", "vertices"])
    np.testing.assert_array_equal(dofs[:, 0::2], 2 * cells)
    np.testing.assert_array_equal(dofs[:, 1::2], 2 * cells + 1)


def solve_manufactured(n, order=1, **solve_kwargs):
    mesh = fem.MeshTri(fem.unit_square(n=n))
    V = fem.VectorBasis(mesh, fem.ElementTri(order, 4))
    local = V.integrate_bilinear_form_local(elasticity)
    b = V.integrate_linear_form(load)
    u, info = V.solve_iterative(
        local, b, tol=1e-12, return_info=True, **solve_kwargs
    )
    uh, _ = V.interpolate(V, u)
    x = V.integration_points[..., 0]
    y = V.integration_points[..., 1]
    err2 = ((uh - u_exact(x, y)) ** 2).sum(-1, keepdims=True)
    e_l2 = float(jnp.sqrt(V.integrate_functional(lambda b_: err2).sum()))
    return V, u, e_l2, info


def test_elasticity_l2_convergence_is_second_order():
    _, _, e1, _ = solve_manufactured(8)
    _, _, e2, _ = solve_manufactured(16)
    _, _, e3, _ = solve_manufactured(32)
    assert 3.3 < e1 / e2 < 4.8, (e1, e2)
    assert 3.3 < e2 / e3 < 4.8, (e2, e3)


def test_iterative_matches_dense_and_symmetric_path():
    mesh = fem.MeshTri(fem.unit_square(n=8))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 4))
    A = V.integrate_bilinear_form(elasticity)
    local = V.integrate_bilinear_form_local(elasticity)
    b = V.integrate_linear_form(load)
    u_dense = V.solve(A, V.solution_tensor(), b)
    u_pcg = V.solve_iterative(local, b, tol=1e-13)
    u_sym = V.solve_iterative(
        local, b, tol=1e-13, precondition="rbm", symmetric_form=True
    )
    np.testing.assert_allclose(
        np.asarray(u_pcg), np.asarray(u_dense), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(u_sym), np.asarray(u_dense), atol=1e-11
    )


def test_rbm_coarse_space_is_h_stable():
    """Iteration counts: RBM coarse must beat plain Jacobi AND stay nearly
    flat under refinement (the constants coarse space does neither for
    elasticity — measured 583 vs 125 iterations at 33k DOFs)."""
    _, _, _, i32 = solve_manufactured(32, precondition="two_level")
    _, _, _, i64 = solve_manufactured(64, precondition="two_level")
    _, _, _, j64 = solve_manufactured(64, precondition="jacobi")
    assert int(i64.iterations) < 0.55 * int(j64.iterations), (
        int(i64.iterations),
        int(j64.iterations),
    )
    # near-h-independence: allow a mild drift between successive levels
    assert int(i64.iterations) < 1.35 * int(i32.iterations) + 10


def test_dirichlet_components_roller():
    """dirichlet_components=(1,) clamps only the y-component at marked
    nodes: the x-components remain free DOFs."""
    mesh = fem.MeshTri(fem.unit_square(n=4))
    V_full = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    V_roll = fem.VectorBasis(
        mesh, fem.ElementTri(1, 2), dirichlet_components=(1,)
    )
    n_nodes = np.asarray(mesh["vertices", "coordinates"]).shape[0]
    marks = np.asarray(mesh["vertices", "markers"]).reshape(-1)
    n_bnd = int((marks == 1).sum())
    inner_full = np.asarray(V_full._basis_parameters["inner_dofs"])
    inner_roll = np.asarray(V_roll._basis_parameters["inner_dofs"])
    assert inner_full.size == 2 * (n_nodes - n_bnd)
    assert inner_roll.size == 2 * n_nodes - n_bnd
    # every x-component DOF is free under the roller variant
    assert set(range(0, 2 * n_nodes, 2)) <= set(inner_roll.tolist())


def test_vector_interpolate_reproduces_linear_fields():
    """P1 vector interpolation is exact on linear displacement fields
    (the patch test), including the Jacobian."""
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    G = np.array([[0.3, -0.2], [0.1, 0.4]])
    c = np.array([0.05, -0.07])
    nodes = np.asarray(V._coords4global_dofs)
    comp = np.arange(V.n_dofs) % 2
    u_nodal = (nodes @ G.T)[np.arange(V.n_dofs), comp] + c[comp]
    u = jnp.asarray(u_nodal.reshape(-1, 1))
    uh, ugh = V.interpolate(V, u)
    pts = np.asarray(V.integration_points)[..., 0, :]  # (T, q, d)
    expect = pts @ G.T + c
    np.testing.assert_allclose(
        np.asarray(uh)[..., 0, :], expect, atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(ugh)[..., 0, :, :],
        np.broadcast_to(G, np.asarray(ugh)[..., 0, :, :].shape),
        atol=1e-13,
    )


def test_vector_p2_solves():
    """P2 vector basis assembles and solves; L2 error far below P1's."""
    _, _, e_p1, _ = solve_manufactured(8, order=1)
    _, _, e_p2, _ = solve_manufactured(8, order=2)
    assert e_p2 < 0.12 * e_p1, (e_p1, e_p2)


def test_vector_basis_validation():
    mesh = fem.MeshTri(fem.unit_square(n=2))
    with pytest.raises(ValueError):
        fem.VectorBasis(mesh, fem.ElementTri(1, 2), n_components=0)
    with pytest.raises(ValueError):
        fem.VectorBasis(
            mesh, fem.ElementTri(1, 2), dirichlet_components=(5,)
        )
    V = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    with pytest.raises(NotImplementedError):
        V.interpolate(fem.Basis(mesh, fem.ElementTri(1, 2)), None)


# -- 3D linear elasticity (tetrahedral tier) ---------------------------------


def u_exact_3d(p):
    """Bubble displacement field, zero on the cube boundary."""
    w = (
        p[..., 0] * (1 - p[..., 0])
        * p[..., 1] * (1 - p[..., 1])
        * p[..., 2] * (1 - p[..., 2])
    )
    return jnp.stack([w, 2 * w, -w], axis=-1)


def body_force_3d(p):
    """f = -div sigma(u_exact_3d), via forward-mode autodiff (independent of
    the assembly pipeline under test)."""
    import jax

    def u_fn(x):
        w = x[0] * (1 - x[0]) * x[1] * (1 - x[1]) * x[2] * (1 - x[2])
        return jnp.stack([w, 2 * w, -w])

    def sigma(x):
        G = jax.jacfwd(u_fn)(x)
        eps = 0.5 * (G + G.T)
        return 2 * MU * eps + LAM * jnp.trace(eps) * jnp.eye(3)

    def divsig(x):
        return jnp.einsum("ijj->i", jax.jacfwd(sigma)(x))

    flat = p.reshape(-1, 3)
    return -jax.vmap(divsig)(flat).reshape(p.shape)


def load_3d(b):
    p = b.integration_points[..., 0, :]  # (T, q, 3)
    f = body_force_3d(p)
    return (b.v * f[..., None, :]).sum(-1, keepdims=True)


def numpy_elasticity_oracle_3d(verts, cells):
    """Plain per-element P1 3D Lame assembly (independent loop code)."""
    n = len(verts)
    K = np.zeros((3 * n, 3 * n))
    gref = np.array(
        [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    for tet in cells:
        p = verts[tet]
        J = np.stack([p[1] - p[0], p[2] - p[0], p[3] - p[0]], axis=1)
        detJ = abs(np.linalg.det(J))
        gphys = gref @ np.linalg.inv(J)  # (4, 3)
        Ke = np.zeros((12, 12))
        for i in range(4):
            for ci in range(3):
                Gi = np.zeros((3, 3))
                Gi[ci] = gphys[i]
                Ei = 0.5 * (Gi + Gi.T)
                for j in range(4):
                    for cj in range(3):
                        Gj = np.zeros((3, 3))
                        Gj[cj] = gphys[j]
                        Ej = 0.5 * (Gj + Gj.T)
                        Ke[3 * i + ci, 3 * j + cj] = (
                            2 * MU * (Ei * Ej).sum()
                            + LAM * np.trace(Gi) * np.trace(Gj)
                        ) * detJ / 6
        idx = np.stack([3 * tet, 3 * tet + 1, 3 * tet + 2], axis=1).reshape(-1)
        K[np.ix_(idx, idx)] += Ke
    return K


def _solve_manufactured_3d(n, **solve_kwargs):
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    mesh = MeshTet(unit_cube(n))
    V = fem.VectorBasis(mesh, ElementTet(1, 2))
    local = V.integrate_bilinear_form_local(elasticity)
    b = V.integrate_linear_form(load_3d)
    u, info = V.solve_iterative(
        local, b, tol=1e-12, return_info=True, **solve_kwargs
    )
    uh, _ = V.interpolate(V, u)
    err2 = ((uh[..., 0, :] - u_exact_3d(V.integration_points[..., 0, :])) ** 2).sum(
        -1
    )
    e_l2 = float(
        jnp.sqrt(
            jnp.sum(V.integrate_functional(lambda b_: err2[..., None, None]))
        )
    )
    return V, u, e_l2, info


def test_vector_assembly_3d_matches_numpy_oracle():
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    mesh = MeshTet(unit_cube(2))
    V = fem.VectorBasis(mesh, ElementTet(1, 2))
    A = np.asarray(V.integrate_bilinear_form(elasticity))
    K = numpy_elasticity_oracle_3d(
        np.asarray(mesh["vertices", "coordinates"]),
        np.asarray(mesh["cells", "vertices"]),
    )
    assert np.abs(A - A.T).max() == 0.0
    np.testing.assert_allclose(A, K, atol=1e-12)


def test_elasticity_3d_converges():
    _, _, e1, _ = _solve_manufactured_3d(3)
    _, _, e2, _ = _solve_manufactured_3d(6)
    assert math.log2(e1 / e2) > 1.5, (e1, e2)


def test_elasticity_3d_rbm_matches_dense():
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    mesh = MeshTet(unit_cube(4))
    V = fem.VectorBasis(mesh, ElementTet(1, 2))
    A = V.integrate_bilinear_form(elasticity)
    b = V.integrate_linear_form(load_3d)
    u_dense = V.solve(A, V.solution_tensor(), b)
    local = V.integrate_bilinear_form_local(elasticity)
    u_rbm, info = V.solve_iterative(
        local, b, tol=1e-12, precondition="two_level", return_info=True
    )
    assert bool(info.converged)
    np.testing.assert_allclose(
        np.asarray(u_rbm), np.asarray(u_dense), atol=1e-10
    )
