"""Assembly oracle: the ACTUAL reference package at /root/reference.

The reference gates assembly on scikit-fem (tests/test_assembly.py:19-110),
which is unavailable here; previous rounds substituted self-authored
oracles (NumPy closed forms, a torch rebuild). This module goes further:
it imports the real ``torch_fem`` package (tensordict standing in via
tools/tensordict_shim.py) and compares assembled stiffness, mass, load and
functional values on the same mesh — an oracle whose assembly code we did
not write.
"""

import os
import sys

import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def reference():
    import tools.tensordict_shim as tensordict_shim

    sys.modules.setdefault("tensordict", tensordict_shim)
    sys.path.insert(0, "/root/reference")
    import torch

    torch.set_default_dtype(torch.float64)
    import torch_fem

    return torch_fem


def _reference_mesh_dict(tri):
    from pytorch_fem_solver_tpu.mesh.topology import build_tri_topology

    verts = np.asarray(tri["vertices"], dtype=np.float64)
    cells = np.asarray(tri["triangles"], dtype=np.int64)
    markers = np.asarray(tri["vertex_markers"], dtype=np.int64)
    topo = build_tri_topology(verts, cells, markers)

    T = cells.shape[0]
    neighbors = -np.ones((T, 3), dtype=np.int64)
    fill = np.zeros(T, dtype=np.int64)
    for a, b in np.asarray(topo["interior_edges_cells"]):
        neighbors[a, fill[a]] = b
        fill[a] += 1
        neighbors[b, fill[b]] = a
        fill[b] += 1

    return {
        "vertices": verts,
        "vertex_markers": markers.reshape(-1, 1).astype(np.int32),
        "triangles": cells.astype(np.int32),
        "edges": np.asarray(topo["edges_vertices"], dtype=np.int32),
        "edge_markers": np.asarray(topo["edges_markers"], dtype=np.int32),
        "neighbors": neighbors.astype(np.int32),
    }


def _dof_permutation(coords_ours, coords_ref):
    lookup = {tuple(np.round(c, 10)): i for i, c in enumerate(coords_ref)}
    return np.array([lookup[tuple(np.round(c, 10))] for c in coords_ours])


def test_assembly_matches_actual_reference(reference):
    """Stiffness + mass + load + elemental functional vs the real
    reference Basis (parity doctrine of reference tests/test_assembly.py)."""
    import jax.numpy as jnp
    import torch

    tri = fem.unit_square(n=6)
    mesh = fem.MeshTri(tri)
    V = fem.Basis(mesh, fem.ElementTri(1, 3))

    rmesh = reference.MeshTri(triangulation=_reference_mesh_dict(tri))
    rV = reference.Basis(
        rmesh, reference.ElementTri(polynomial_order=1, integration_order=3)
    )

    # our DOF order -> reference DOF order via coordinates
    perm = _dof_permutation(
        np.asarray(V._coords4global_dofs),
        rV._coords4global_dofs.detach().cpu().numpy(),
    )

    A = np.asarray(
        V.integrate_bilinear_form(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        )
    )
    A_ref = (
        rV.integrate_bilinear_form(lambda b: b.v_grad @ b.v_grad.mT)
        .detach()
        .cpu()
        .numpy()
    )
    np.testing.assert_allclose(A, A_ref[np.ix_(perm, perm)], atol=1e-12)

    M = np.asarray(
        V.integrate_bilinear_form(lambda b: b.v @ jnp.matrix_transpose(b.v))
    )
    M_ref = (
        rV.integrate_bilinear_form(lambda b: b.v @ b.v.mT)
        .detach()
        .cpu()
        .numpy()
    )
    np.testing.assert_allclose(M, M_ref[np.ix_(perm, perm)], atol=1e-14)

    def load_ours(b):
        x, y = b.integration_points[..., 0:1], b.integration_points[..., 1:2]
        return (1.0 + x * y) * b.v

    def load_ref(b):
        x, y = torch.split(b.integration_points, 1, dim=-1)
        return (1.0 + x * y) * b.v

    f = np.asarray(V.integrate_linear_form(load_ours))
    f_ref = rV.integrate_linear_form(load_ref).detach().cpu().numpy()
    np.testing.assert_allclose(f, f_ref[perm], atol=1e-14)

    def func_ours(b):
        x = b.integration_points[..., 0:1]
        return x**2

    def func_ref(b):
        x, _ = torch.split(b.integration_points, 1, dim=-1)
        return x**2

    # per-cell functional integrals: cell order is identical (same dict)
    g = np.asarray(V.integrate_functional(func_ours))
    g_ref = rV.integrate_functional(func_ref).detach().cpu().numpy()
    np.testing.assert_allclose(g.sum(), g_ref.sum(), atol=1e-13)


def test_solve_matches_actual_reference(reference):
    """Full Poisson solve parity: same mesh, same forms, DOF-for-DOF."""
    import jax.numpy as jnp
    import torch

    tri = fem.unit_square(n=5)
    mesh = fem.MeshTri(tri)
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    rmesh = reference.MeshTri(triangulation=_reference_mesh_dict(tri))
    rV = reference.Basis(
        rmesh, reference.ElementTri(polynomial_order=1, integration_order=2)
    )
    perm = _dof_permutation(
        np.asarray(V._coords4global_dofs),
        rV._coords4global_dofs.detach().cpu().numpy(),
    )

    u = V.solve(
        V.integrate_bilinear_form(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        ),
        V.solution_tensor(),
        V.integrate_linear_form(lambda b: b.v),
    )
    u_ref = rV.solve(
        rV.integrate_bilinear_form(lambda b: b.v_grad @ b.v_grad.mT),
        rV.solution_tensor(),
        rV.integrate_linear_form(lambda b: b.v),
    )
    np.testing.assert_allclose(
        np.asarray(u)[:, 0],
        u_ref.detach().cpu().numpy()[perm, 0],
        atol=1e-12,
    )


def test_edge_functional_matches_actual_reference(reference):
    """Interior-edge quadrature parity: integrate an analytic function over
    all interior edges through both frameworks' edge bases.

    Reference quirk (not replicated): its edge ``integration_points`` carry
    the quadrature axis at dim -2 — (Ei, 1, q, d) — while its ``_dx`` holds
    quadrature at dim -3, so a function of edge coordinates written in the
    cell convention silently broadcasts weights against ALL quadrature
    points (a 2x overcount at q=2; verified against the exact Simpson
    integral 6.02287...). Our edge basis keeps the uniform (..., E, q,
    n_loc, d) convention, matching the analytic value exactly; the
    reference side of this test transposes into its own layout first.
    """
    import torch

    tri = fem.unit_square(n=6)
    mesh = fem.MeshTri(tri)
    Ve = fem.InteriorEdgesBasis(mesh, fem.ElementLine(1, 2))

    rmesh = reference.MeshTri(triangulation=_reference_mesh_dict(tri))
    rVe = reference.InteriorEdgesBasis(
        rmesh, reference.ElementLine(polynomial_order=1, integration_order=2)
    )

    def f_ours(b):
        x, y = b.integration_points[..., 0:1], b.integration_points[..., 1:2]
        return 1.0 + x * x - 2.0 * y

    def f_ref(b):
        pts = b.integration_points.transpose(-3, -2)  # quirk: q lives at -2
        x, y = torch.split(pts, 1, dim=-1)
        return 1.0 + x * x - 2.0 * y

    total = float(Ve.integrate_functional(f_ours).sum())
    total_ref = float(rVe.integrate_functional(f_ref).sum())
    # exact value of the quadratic's edge integral (Simpson per segment)
    assert abs(total - 6.0228715691906345) < 1e-12, total
    assert abs(total - total_ref) < 1e-12, (total, total_ref)
