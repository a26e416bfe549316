"""Cross-framework assembly oracle: the reference's own torch pipeline.

The reference validates against scikit-fem (tests/test_assembly.py:19-110,
absent here). This file rebuilds the reference's *exact* assembly recipe in
torch — broadcast integrands over ``(n_cells, n_quad, n_loc, n_loc)``, dense
``index_put_(accumulate=True)`` scatter (abstract_basis.py:74-112), P1
barycentric shape functions and analytic 2x2 inverse maps
(element_tri.py:23-41,132-145) — and checks our JAX assembly against it on
the same triangulations. An independent implementation in an independent
framework, matching the reference line of attack rather than translating
our own code.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem

torch = pytest.importorskip("torch")


def torch_reference_assembly(vertices, triangles, quad_pts, quad_wts, rhs_fn):
    """P1 stiffness/mass/load exactly as the reference computes them."""
    t = torch.tensor
    verts = t(vertices, dtype=torch.float64)
    cells = t(triangles, dtype=torch.int64)
    p = verts[cells]  # (T, 3, 2)
    T = p.shape[0]

    # barycentric gradients and map Jacobian (element_tri.py:10-12, basis.py:87)
    bar_grad = t(
        [[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]], dtype=torch.float64
    )  # (3, 2)
    jac = p.mT @ bar_grad  # (T, 2, 2)
    det = jac[:, 0, 0] * jac[:, 1, 1] - jac[:, 0, 1] * jac[:, 1, 0]
    inv = (
        torch.stack(
            [
                torch.stack([jac[:, 1, 1], -jac[:, 0, 1]], dim=-1),
                torch.stack([-jac[:, 1, 0], jac[:, 0, 0]], dim=-1),
            ],
            dim=-2,
        )
        / det[:, None, None]
    )

    q = t(quad_pts, dtype=torch.float64)  # (Q, 2)
    w = t(quad_wts, dtype=torch.float64)  # (Q,)
    lam = torch.stack([1.0 - q[:, 0] - q[:, 1], q[:, 0], q[:, 1]], dim=-1)
    v = lam[None, :, :, None]  # (1, Q, 3, 1)
    v_grad = (bar_grad @ inv)[:, None]  # (T, 1, 3, 2)

    ref_area = 0.5
    dx = ref_area * w[None, :, None, None] * det.abs()[:, None, None, None]

    stiff_local = (v_grad @ v_grad.mT) * dx  # (T, Q->1 broadcast, 3, 3)
    stiff_local = stiff_local.sum(dim=1)
    mass_local = ((v @ v.mT) * dx).sum(dim=1)

    pts = (lam[None, :, None, :] @ p[:, None]).squeeze(-2)  # (T, Q, 2)
    f = rhs_fn(pts[..., 0], pts[..., 1])  # (T, Q)
    load_local = (f[:, :, None, None] * v * dx).sum(dim=1)[..., 0]  # (T, 3)

    n = verts.shape[0]
    rows = cells.repeat_interleave(3, dim=1).reshape(-1)
    cols = cells.repeat(1, 3).reshape(-1)
    A = torch.zeros(n, n, dtype=torch.float64)
    M = torch.zeros(n, n, dtype=torch.float64)
    A.index_put_((rows, cols), stiff_local.reshape(-1), accumulate=True)
    M.index_put_((rows, cols), mass_local.reshape(-1), accumulate=True)
    b = torch.zeros(n, dtype=torch.float64)
    b.index_put_((cells.reshape(-1),), load_local.reshape(-1), accumulate=True)
    return A.numpy(), M.numpy(), b.numpy()


def test_assembly_matches_torch_reference_pipeline():
    tri = fem.unit_square(max_area=0.5**6)
    mesh = fem.MeshTri(tri)
    element = fem.ElementTri(1, 2)
    V = fem.Basis(mesh, element)

    A_ours = np.asarray(
        V.integrate_bilinear_form(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        )
    )
    M_ours = np.asarray(
        V.integrate_bilinear_form(lambda b: b.v @ jnp.matrix_transpose(b.v))
    )

    def rhs(x, y):
        return np.sin(math.pi * x) * np.cos(math.pi * y) + 0 * x

    b_ours = np.asarray(
        V.integrate_linear_form(
            lambda b_: jnp.sin(math.pi * b_.integration_points[..., 0:1])
            * jnp.cos(math.pi * b_.integration_points[..., 1:2])
            * b_.v
        )
    )[:, 0]

    quad_pts = np.asarray(element.gaussian_nodes)
    quad_wts = np.asarray(element.gaussian_weights).reshape(-1)
    A_ref, M_ref, b_ref = torch_reference_assembly(
        np.asarray(tri["vertices"]),
        np.asarray(tri["triangles"]),
        quad_pts,
        quad_wts,
        lambda x, y: torch.sin(math.pi * x) * torch.cos(math.pi * y),
    )

    scale_A = np.abs(A_ref).max()
    np.testing.assert_allclose(A_ours, A_ref, atol=1e-12 * scale_A)
    np.testing.assert_allclose(M_ours, M_ref, atol=1e-14)
    np.testing.assert_allclose(b_ours, b_ref, atol=1e-14)


def test_solution_matches_torch_reference_pipeline():
    """Full reduced solve agrees between the two frameworks."""
    tri = fem.unit_square(n=9)
    mesh = fem.MeshTri(tri)
    element = fem.ElementTri(1, 2)
    V = fem.Basis(mesh, element)

    A = V.integrate_bilinear_form(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    b = V.integrate_linear_form(lambda b_: b_.v)
    u_ours = np.asarray(V.solve(A, V.solution_tensor(), b))[:, 0]

    quad_pts = np.asarray(element.gaussian_nodes)
    quad_wts = np.asarray(element.gaussian_weights).reshape(-1)
    A_ref, _, b_ref = torch_reference_assembly(
        np.asarray(tri["vertices"]),
        np.asarray(tri["triangles"]),
        quad_pts,
        quad_wts,
        lambda x, y: torch.ones_like(x),
    )
    markers = np.asarray(tri["vertex_markers"]).reshape(-1)
    inner = np.nonzero(markers == 0)[0]
    u_ref = np.zeros_like(b_ref)
    u_ref[inner] = np.linalg.solve(A_ref[np.ix_(inner, inner)], b_ref[inner])
    np.testing.assert_allclose(u_ours, u_ref, atol=1e-12)
