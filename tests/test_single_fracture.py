"""Single-fracture FEM vs manufactured solution (B=1 batched path).

Parity with reference tests/test_1_fracture.py / test_1_fracture_2d.py
(which print relative H1 errors and plot): a single planar fracture embedded
in 3D must reproduce the plain-2D solve exactly, and converge at O(h) in H1
against a manufactured solution — both through the batched ``FracturesTri``
path with batch size 1 and through the flat network path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem


def a_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def test_single_fracture_matches_2d_solve():
    """One fracture in the z=0 plane == the plain 2D problem."""
    n = 8
    tri = fem.rectangle(n, n)
    anchors = np.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    f3d = np.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])

    mesh3d = fem.FracturesTri([tri], f3d, anchor_vertices_2d=anchors)
    V3 = fem.FractureBasis(mesh3d, fem.ElementTri(1, 4))

    mesh2d = fem.MeshTri(tri)
    V2 = fem.Basis(mesh2d, fem.ElementTri(1, 4))

    def rhs3(c):
        x, y = c[..., 0:1], c[..., 1:2]
        return 2.0 * jnp.pi**2 * jnp.sin(jnp.pi * x) * jnp.sin(jnp.pi * y)

    u3 = V3.solve(
        V3.integrate_bilinear_form(a_form),
        V3.solution_tensor(),
        V3.integrate_linear_form(lambda b: rhs3(b.integration_points) * b.v),
    )
    u2 = V2.solve(
        V2.integrate_bilinear_form(a_form),
        V2.solution_tensor(),
        V2.integrate_linear_form(lambda b: rhs3(b.integration_points) * b.v),
    )

    # identical mesh + isometric embedding: DOF values must agree; map
    # between DOF orders via coordinates
    c3 = np.asarray(V3._coords4global_dofs)  # (n_g, 3)
    c2 = np.asarray(V2._coords4global_dofs)  # (n_g, 2)
    lookup = {tuple(np.round(c, 9)): i for i, c in enumerate(c2)}
    perm = np.array([lookup[tuple(np.round(c[:2], 9))] for c in c3])
    np.testing.assert_allclose(
        np.asarray(u3)[:, 0], np.asarray(u2)[perm, 0], atol=1e-12
    )


def test_single_tilted_fracture_convergence():
    """Manufactured solution on a tilted fracture plane: O(h) in H1."""
    # plane through (0,0,0), spanned by orthonormal u=(1,1,0)/sqrt2,
    # v=(0,0,1): isometric chart (s,t) -> (s/sqrt2, s/sqrt2, t)
    s2 = 1.0 / np.sqrt(2.0)
    anchors = np.array([[[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]])
    f3d = np.array([[[0.0, 0.0, 0.0], [s2, s2, 0.0], [0.0, 0.0, 1.0]]])

    errs = []
    for n in (4, 8):
        tri = fem.rectangle(n, n)
        mesh = fem.FracturesTri([tri], f3d, anchor_vertices_2d=anchors)
        V = fem.FractureBasis(mesh, fem.ElementTri(1, 4))

        # in chart coords (s,t): u = sin(pi s) sin(pi t)
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
            # tangential gradient in 3D: ds = pi cos sin * u_dir, dt = ...
            ds = jnp.pi * jnp.cos(jnp.pi * s) * jnp.sin(jnp.pi * t)
            dt = jnp.pi * jnp.sin(jnp.pi * s) * jnp.cos(jnp.pi * t)
            g = jnp.concatenate([ds * s2, ds * s2, dt], axis=-1)
            return (uh - e) ** 2 + ((uh_grad - g) ** 2).sum(-1, keepdims=True)

        errs.append(float(jnp.sqrt(V.integrate_functional(h1_err, Iu, Iug).sum())))

    assert errs[0] / errs[1] > 1.8, errs


def test_plotting_helpers_run():
    """Plot utilities execute headless on both 2D and network meshes."""
    import matplotlib

    matplotlib.use("Agg")

    from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network
    from pytorch_fem_solver_tpu.utils.plotting import (
        plot_cellwise,
        plot_network_3d,
        plot_trace_profile,
    )

    mesh2 = fem.MeshTri(fem.unit_square(n=3))
    plot_cellwise(mesh2, np.arange(mesh2.n_cells), "test")

    f1 = [[-1, 0, 0], [1, 0, 0], [1, 1, 0], [-1, 1, 0]]
    f2 = [[0, 0, -1], [0, 0, 1], [0, 1, 1], [0, 1, -1]]
    net = build_fracture_network([f1, f2], h=0.5)
    plot_network_3d(net, vertex_values=np.asarray(net["vertices", "coordinates_3d"])[:, 1])
    plot_trace_profile(
        net, np.ones(net["interior_edges", "vertices"].shape[0]), "jump"
    )
