"""P2 edge traces + direct MeshesTri batched use."""

import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem


def test_p2_edge_traces_continuous_and_exact():
    """P2 interpolant of a quadratic: exact traces, zero gradient jump."""
    mesh = fem.MeshTri(fem.unit_square(n=4))
    V = fem.Basis(mesh, fem.ElementTri(2, 4))
    V_edges = fem.InteriorEdgesBasis(mesh, fem.ElementLine(1, 3))

    coords = np.asarray(V._coords4global_dofs)

    def f(x, y):
        return 1.0 + 2 * x - y + 3 * x * y + x**2 - 2 * y**2

    u = jnp.asarray(f(coords[:, 0], coords[:, 1]).reshape(-1, 1))
    interp, interp_grad = V.interpolate(V_edges, u)

    pts = np.asarray(V_edges.integration_points)  # (Ei, q, 1, 2)
    exact_vals = f(pts[..., 0], pts[..., 1])  # (Ei, q, 1)
    vals = np.asarray(interp)  # (Ei, 2, q, 1, 1)
    for side in range(2):
        np.testing.assert_allclose(
            vals[:, side, :, 0, 0], exact_vals[:, :, 0], atol=1e-12
        )

    # gradient traces of the exact quadratic agree from both sides
    grads = np.asarray(interp_grad)  # (Ei, 2, q, 1, 2)
    np.testing.assert_allclose(grads[:, 0], grads[:, 1], atol=1e-11)
    gx = 2.0 + 3 * pts[..., 1] + 2 * pts[..., 0]
    gy = -1.0 + 3 * pts[..., 0] - 4 * pts[..., 1]
    np.testing.assert_allclose(grads[:, 0, :, 0, 0], gx[:, :, 0], atol=1e-11)
    np.testing.assert_allclose(grads[:, 0, :, 0, 1], gy[:, :, 0], atol=1e-11)


def test_p2_network_shared_border_edge_midpoint_is_dirichlet():
    """Two fractures glued along a common *border* edge: that edge has two
    incident cells network-wide, yet it lies on the outer boundary of both
    fractures, so its P2 midpoint DOF must be Dirichlet (matching the P1
    vertex rule). A network-wide incidence count of 1 would miss it."""
    tri = fem.unit_square(n=4)
    anchors = [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]
    corners_a = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]  # (x, y) -> (x, y, 0)
    corners_b = [[0, 0, 0], [1, 0, 0], [0, 0, 1]]  # (x, y) -> (x, 0, y)
    mesh = fem.FractureNetworkMesh(
        [tri, tri], [corners_a, corners_b], anchor_vertices_2d=[anchors, anchors]
    )
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(2, 4))

    coords = np.asarray(V._coords4global_dofs)
    markers = np.asarray(V._nodes4boundary_dofs).reshape(-1)
    n_gverts = mesh.n_global_dofs

    # midpoint DOFs on the shared border edge y=0, z=0, 0<x<1
    on_shared = (
        (np.abs(coords[:, 1]) < 1e-12)
        & (np.abs(coords[:, 2]) < 1e-12)
        & (coords[:, 0] > 1e-12)
        & (coords[:, 0] < 1 - 1e-12)
    )
    mid_shared = on_shared.copy()
    mid_shared[:n_gverts] = False
    assert mid_shared.sum() == 4  # n=4 grid: 4 midpoints along the edge
    assert (markers[mid_shared] != 0).all()

    # and interior midpoints (z=0 plane, strictly inside) stay free
    interior = (
        (np.abs(coords[:, 2]) < 1e-12)
        & (coords[:, 0] > 1e-12) & (coords[:, 0] < 1 - 1e-12)
        & (coords[:, 1] > 1e-12) & (coords[:, 1] < 1 - 1e-12)
    )
    interior[:n_gverts] = False
    assert interior.any()
    assert (markers[interior] == 0).all()


def test_meshes_tri_direct_batch():
    """MeshesTri stacks equal-topology meshes; batched gathers line up."""
    t1 = fem.rectangle(3, 3)
    t2 = fem.rectangle(3, 3, x0=2.0, x1=5.0, y0=1.0, y1=3.0)
    batch = fem.MeshesTri([t1, t2])

    assert batch.batch_size() == (2,)
    assert batch["vertices", "coordinates"].shape[0] == 2
    # geometry differs per batch entry, topology identical
    np.testing.assert_array_equal(
        np.asarray(batch["cells", "vertices"][0]),
        np.asarray(batch["cells", "vertices"][1]),
    )
    c = batch.compute_coordinates_4_cells(
        batch["vertices", "coordinates"], batch["cells", "vertices"]
    )
    assert c.shape == (2, 18, 3, 2)
    # each entry's cell coords match its own single-mesh construction
    single = fem.MeshTri(t2)
    np.testing.assert_allclose(
        np.asarray(c[1]), np.asarray(single["cells", "coordinates"]), atol=0
    )
    # per-mesh interior-edge normals are unit and oriented
    normals = np.asarray(batch["interior_edges", "normals"])
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-13)



def a_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def test_p2_tilted_fracture_convergence_oh2():
    """P2 on the batched fracture path (beyond the reference, whose P2 DOF
    map is commented out): O(h^2) H1 convergence on the manufactured
    tilted-plane problem of test_single_fracture.py."""
    s2 = 1.0 / np.sqrt(2.0)
    anchors = np.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    f3d = np.array([[[0.0, 0.0, 0.0], [s2, s2, 0.0], [0.0, 0.0, 1.0]]])

    errs = []
    for n in (4, 8):
        tri = fem.rectangle(n, n)
        mesh = fem.FracturesTri([tri], f3d, anchor_vertices_2d=anchors)
        V = fem.FractureBasis(mesh, fem.ElementTri(2, 4))

        def chart(c):
            s = (c[..., 0:1] + c[..., 1:2]) * s2
            t = c[..., 2:3]
            return s, t

        def rhs(c):
            s, t = chart(c)
            return 2.0 * jnp.pi**2 * jnp.sin(jnp.pi * s) * jnp.sin(jnp.pi * t)

        u = V.solve(
            V.integrate_bilinear_form(a_form),
            V.solution_tensor(),
            V.integrate_linear_form(lambda b: rhs(b.integration_points) * b.v),
        )
        Iu, Iug = V.interpolate(V, u)

        def h1_err(basis, uh, uh_grad):
            s, t = chart(basis.integration_points)
            e = jnp.sin(jnp.pi * s) * jnp.sin(jnp.pi * t)
            ds = jnp.pi * jnp.cos(jnp.pi * s) * jnp.sin(jnp.pi * t)
            dt = jnp.pi * jnp.sin(jnp.pi * s) * jnp.cos(jnp.pi * t)
            g = jnp.concatenate([ds * s2, ds * s2, dt], axis=-1)
            return (uh - e) ** 2 + ((uh_grad - g) ** 2).sum(-1, keepdims=True)

        errs.append(
            float(jnp.sqrt(V.integrate_functional(h1_err, Iu, Iug).sum()))
        )

    assert errs[0] / errs[1] > 3.5, errs  # O(h^2): ratio ~4 per halving


def test_p2_batched_and_flat_dfn_paths_agree():
    """P2 solves on FractureBasis (batched) and FractureNetworkBasis (flat)
    agree DOF-for-DOF on the same two-fracture geometry, including the
    shared trace midpoint DOFs."""
    tri = fem.rectangle(6, 3, x0=-1.0, x1=1.0, y0=0.0, y1=1.0)
    anchors = np.array([[[-1.0, 0.0], [1.0, 0.0], [-1.0, 1.0]]] * 2)
    f3d = np.array(
        [
            [[-1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 1.0, 0.0]],
            [[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [0.0, 1.0, -1.0]],
        ]
    )
    batched = fem.FracturesTri([tri, tri], f3d, anchor_vertices_2d=anchors)
    Vb = fem.FractureBasis(batched, fem.ElementTri(2, 4))

    flat = fem.FractureNetworkMesh(
        [tri, tri], f3d, anchor_vertices_2d=anchors
    )
    Vf = fem.FractureNetworkBasis(flat, fem.ElementTri(2, 4))

    assert Vb.n_dofs == Vf.n_dofs

    def rhs(c):
        return 1.0 + c[..., 1:2]

    def solve(V):
        return V.solve(
            V.integrate_bilinear_form(a_form),
            V.solution_tensor(),
            V.integrate_linear_form(lambda b: rhs(b.integration_points) * b.v),
        )

    ub, uf = solve(Vb), solve(Vf)

    cb = np.round(np.asarray(Vb._coords4global_dofs), 9)
    cf = np.round(np.asarray(Vf._coords4global_dofs), 9)
    lookup = {tuple(c): i for i, c in enumerate(cf)}
    perm = np.array([lookup[tuple(c)] for c in cb])
    np.testing.assert_allclose(
        np.asarray(ub)[:, 0], np.asarray(uf)[perm, 0], atol=1e-10
    )
