"""Discrete fracture network: maps, global glue, solve, trace jumps.

Oracles mirror the reference test doctrine (test_fracture_map.py,
test_global_local_idx.py, test_1_fracture.py, test_fracture_jump.py) but with
assertions instead of plots: exact corner correspondence of the affine maps,
counting invariants of the dedup glue, manufactured-solution convergence on
the 2-fracture network of example_fractures_fem.py:31-57, and the analytic
flux jump across the trace.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem


def build_two_fracture(n):
    """The example_fractures_fem geometry: two unit-width fractures crossing
    at x = z = 0 (reference example_fractures_fem.py:31-57)."""
    tri = fem.rectangle(2 * n, n, x0=-1.0, x1=1.0, y0=0.0, y1=1.0)
    anchors = np.array([[[-1.0, 0.0], [1.0, 0.0], [-1.0, 1.0]]] * 2)
    f3d = np.array(
        [
            [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 1.0, 0.0]],
            [[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 1.0, -1.0]],
        ]
    )
    mesh = fem.FracturesTri([tri, tri], f3d, anchor_vertices_2d=anchors)
    V = fem.FractureBasis(mesh, fem.ElementTri(1, 4))
    return mesh, V


def exact(c):
    x, y, z = c[..., 0:1], c[..., 1:2], c[..., 2:3]
    f1 = -y * (1 - y) * jnp.abs(x) * (x**2 - 1)
    f2 = y * (1 - y) * jnp.abs(z) * (z**2 - 1)
    return jnp.concatenate([f1[0:1], f2[1:2]], axis=0)


def rhs(c):
    x, y, z = c[..., 0:1], c[..., 1:2], c[..., 2:3]
    r1 = 6.0 * (y - y**2) * jnp.abs(x) - 2.0 * (jnp.abs(x) ** 3 - jnp.abs(x))
    r2 = -6.0 * (y - y**2) * jnp.abs(z) + 2.0 * (jnp.abs(z) ** 3 - jnp.abs(z))
    return jnp.concatenate([r1[0:1], r2[1:2]], axis=0)


def exact_grad(c):
    x, y, z = c[..., 0:1], c[..., 1:2], c[..., 2:3]
    g1 = jnp.concatenate(
        [
            -y * (1 - y) * (jnp.sign(x) * (x**2 - 1) + 2 * x * jnp.abs(x)),
            -(1 - 2 * y) * jnp.abs(x) * (x**2 - 1),
            jnp.zeros_like(x),
        ],
        axis=-1,
    )
    g2 = jnp.concatenate(
        [
            jnp.zeros_like(x),
            (1 - 2 * y) * jnp.abs(z) * (z**2 - 1),
            y * (1 - y) * (jnp.sign(z) * (z**2 - 1) + 2 * z * jnp.abs(z)),
        ],
        axis=-1,
    )
    return jnp.concatenate([g1[0:1], g2[1:2]], axis=0)


def a_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def l_form(basis):
    return rhs(basis.integration_points) * basis.v


def test_fracture_map_corners_and_scales():
    mesh, _ = build_two_fracture(2)
    jac = np.asarray(mesh["jacobian_fracture_map"])
    t = np.asarray(mesh["translation_vector"])

    # anchors map exactly to prescribed 3D corners
    anchors = np.array([[-1.0, 0.0], [1.0, 0.0], [-1.0, 1.0]])
    images_f1 = (jac[0] @ anchors.T + t[0]).T
    np.testing.assert_allclose(
        images_f1, [[-1, 0, 0], [1, 0, 0], [-1, 1, 0]], atol=1e-12
    )
    images_f2 = (jac[1] @ anchors.T + t[1]).T
    np.testing.assert_allclose(
        images_f2, [[0, 0, -1], [0, 0, 1], [0, 1, -1]], atol=1e-12
    )

    # isometric embeddings: area scale 1, pseudo-inverse is a left inverse
    det = np.asarray(mesh["det_jacobian_fracture_map"])
    np.testing.assert_allclose(det.reshape(-1), 1.0, atol=1e-12)
    inv = np.asarray(mesh["inv_jacobian_fracture_map"])
    for b in range(2):
        np.testing.assert_allclose(inv[b] @ jac[b], np.eye(2), atol=1e-12)

    # lifted normals are unit directions orthogonal to the lifted edges
    n3 = np.asarray(mesh["interior_edges", "normals_3d"])
    np.testing.assert_allclose(np.linalg.norm(n3, axis=-1), 1.0, atol=1e-12)
    e3 = np.asarray(mesh["interior_edges", "coordinates_3d"])
    vec = e3[:, :, 1] - e3[:, :, 0]
    np.testing.assert_allclose((n3[:, :, 0] * vec).sum(-1), 0.0, atol=1e-12)


def test_global_triangulation_counts():
    n = 4
    mesh, V = build_two_fracture(n)
    g = V.global_triangulation
    n_local = mesh["vertices", "coordinates"].shape[1]
    # trace x=0 holds n+1 shared vertices; every other vertex is unique
    n_trace = n + 1
    assert g["vertices_3D"].shape[0] == 2 * n_local - n_trace
    assert g["traces_global_vertices_idx"].shape[0] == n_trace
    assert g["traces_global_edges_idx"].shape[0] == n
    assert g["traces_local_edges_idx"].shape == (2, n)

    # trace vertices all lie on x = z = 0
    tv = np.asarray(g["vertices_3D"])[np.asarray(g["traces_global_vertices_idx"])]
    np.testing.assert_allclose(tv[:, 0], 0.0, atol=1e-12)
    np.testing.assert_allclose(tv[:, 2], 0.0, atol=1e-12)

    # local->global->local roundtrip
    g2l = np.asarray(g["global2local_idx"])
    l2g = np.asarray(g["local2global_idx"])
    np.testing.assert_array_equal(g2l[l2g], np.arange(g["vertices_3D"].shape[0]))


def test_two_fracture_fem_convergence():
    def h1_err(basis, sol, sol_grad):
        e = exact(basis.integration_points)
        g = exact_grad(basis.integration_points)
        return (e - sol) ** 2 + ((g - sol_grad) ** 2).sum(-1, keepdims=True)

    def h1_ex(basis):
        e = exact(basis.integration_points)
        g = exact_grad(basis.integration_points)
        return e**2 + (g**2).sum(-1, keepdims=True)

    errs = []
    for n in (4, 8):
        _, V = build_two_fracture(n)
        A = V.integrate_bilinear_form(a_form)
        b = V.integrate_linear_form(l_form)
        u = V.solve(A, V.solution_tensor(), b)
        Iu, Iug = V.interpolate(V, u)
        num = jnp.sqrt(V.integrate_functional(h1_err, Iu, Iug).sum())
        den = jnp.sqrt(V.integrate_functional(h1_ex).sum())
        errs.append(float(num / den))

    assert errs[0] / errs[1] > 1.8, errs  # O(h)
    assert errs[1] < 0.25


def test_fracture_pcg_matches_dense():
    _, V = build_two_fracture(4)
    A = V.integrate_bilinear_form(a_form)
    b = V.integrate_linear_form(l_form)
    u_dense = V.solve(A, V.solution_tensor(), b)
    local = V.integrate_bilinear_form_local(a_form)
    u_pcg = V.solve_iterative(local, b, tol=1e-13)
    np.testing.assert_allclose(np.asarray(u_pcg), np.asarray(u_dense), atol=1e-9)


def test_trace_jump_of_exact_solution():
    """Normal-flux jump of I_h(exact) across trace edges -> 2 y (1-y)."""
    n = 16
    mesh, V = build_two_fracture(n)
    Ve = fem.InteriorEdgesFractureBasis(mesh, fem.ElementLine(1, 2))

    # exact nodal values on the global DOFs
    g = V.global_triangulation
    u_nodal = exact(
        np.asarray(mesh["vertices", "coordinates_3d"])
    ).reshape(-1, 1)[np.asarray(g["local2global_idx"])]
    u_nodal = jnp.asarray(np.asarray(u_nodal))

    _, Iug = V.interpolate(Ve, u_nodal)
    n_E = mesh["interior_edges", "normals_3d"][..., None, :, :]
    jump = (Iug[:, :, 0] * n_E).sum(-1) + (Iug[:, :, 1] * -n_E).sum(-1)
    jump = np.asarray(jump)[..., 0, 0]  # (B, Ei)

    mids = np.asarray(mesh["interior_edges", "coordinates_3d"]).mean(axis=2)
    y_mid = mids[..., 1]

    trace_idx = np.asarray(g["traces_interior_edges_idx"])
    assert (trace_idx >= 0).all()
    h = 1.0 / n
    for b in range(2):
        idx = trace_idx[b]
        jt = np.abs(jump[b, idx])
        expect = 2.0 * y_mid[b, idx] * (1.0 - y_mid[b, idx])
        assert np.abs(jt - expect).max() < 4.0 * h, (jt, expect)

    # off-trace edges: jump vanishes as O(h)
    mask = np.ones(jump.shape[1], dtype=bool)
    mask[trace_idx[0]] = False
    off = np.abs(jump[0, mask])
    assert off.max() < 4.0 * h


def test_continuous_linear_function_has_zero_jump():
    mesh, V = build_two_fracture(4)
    Ve = fem.InteriorEdgesFractureBasis(mesh, fem.ElementLine(1, 2))
    coords = np.asarray(V._coords4global_dofs)  # (n_g, 3) in 3D
    u = jnp.asarray((0.5 * coords[:, 1]).reshape(-1, 1))  # u = y/2: linear, continuous
    _, Iug = V.interpolate(Ve, u)
    n_E = mesh["interior_edges", "normals_3d"][..., None, :, :]
    jump = (Iug[:, :, 0] * n_E).sum(-1) + (Iug[:, :, 1] * -n_E).sum(-1)
    np.testing.assert_allclose(np.asarray(jump), 0.0, atol=1e-12)


def test_edge_functional_total_length_3d():
    mesh, _ = build_two_fracture(3)
    Ve = fem.InteriorEdgesFractureBasis(mesh, fem.ElementLine(1, 2))
    total = np.asarray(
        Ve.integrate_functional(
            lambda b: jnp.ones_like(b.integration_points[..., :1])
        )
    ).sum()
    e3 = np.asarray(mesh["interior_edges", "coordinates_3d"])
    expect = np.linalg.norm(e3[:, :, 1] - e3[:, :, 0], axis=-1).sum()
    assert abs(total - expect) < 1e-12


def test_anisotropic_normals_perpendicular_to_lifted_edges():
    """Normals must stay in-plane and perpendicular for non-isometric charts."""
    tri = fem.rectangle(4, 4)
    anchors = np.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    # chart stretches x by 2 and y by 0.5: J = [[2,0],[0,0.5],[0,0]]
    f3d = np.array([[[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 0.5, 0.0]]])
    mesh = fem.FracturesTri([tri], f3d, anchor_vertices_2d=anchors)

    n3 = np.asarray(mesh["interior_edges", "normals_3d"])  # (1, Ei, 1, 3)
    e3 = np.asarray(mesh["interior_edges", "coordinates_3d"])
    vec = e3[:, :, 1] - e3[:, :, 0]
    np.testing.assert_allclose(np.linalg.norm(n3, axis=-1), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        (n3[:, :, 0] * vec).sum(-1), 0.0, atol=1e-12
    )
    # in-plane: z component zero for this planar chart
    np.testing.assert_allclose(n3[..., 2], 0.0, atol=1e-12)


def test_collinear_anchor_rejection():
    tri = fem.rectangle(3, 3)
    f3d = np.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]]])
    with pytest.raises(ValueError, match="collinear"):
        # default anchors = first three grid vertices, which are collinear
        fem.FracturesTri([tri], f3d)


def test_interpolate_function_returning_1d_values():
    """A closure returning (N,) per-node values (no trailing component
    axis) must interpolate identically to its (N, 1) twin — the nodal
    values are reshaped before broadcasting against v/v_grad, otherwise
    the n_loc axis silently pairs with the trailing 1 of the shape table
    (an outer product, not an interpolant)."""
    mesh, V = build_two_fracture(3)
    f_flat = lambda c: 0.25 * c[..., 0] + 0.5 * c[..., 1]  # (N,)
    f_col = lambda c: (0.25 * c[..., 0] + 0.5 * c[..., 1])[..., None]

    interp_flat, grad_flat = V.interpolate(V, None)
    # interpolate returns closures when tensor is None
    vals_flat = np.asarray(interp_flat(f_flat))
    vals_col = np.asarray(interp_flat(f_col))
    assert vals_flat.shape == vals_col.shape
    np.testing.assert_allclose(vals_flat, vals_col, atol=1e-14)
    g_flat = np.asarray(grad_flat(f_flat))
    g_col = np.asarray(grad_flat(f_col))
    np.testing.assert_allclose(g_flat, g_col, atol=1e-14)
