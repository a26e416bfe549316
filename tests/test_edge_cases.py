"""Robustness edge cases: degenerate inputs the happy paths never see."""

import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network
from pytorch_fem_solver_tpu.mesh.pslg import triangulate_pslg


def test_single_cell_mesh():
    """One triangle: no interior edges, everything boundary."""
    mesh = fem.MeshTri(
        {"vertices": [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], "triangles": [[0, 1, 2]]}
    )
    assert mesh.n_cells == 1
    assert mesh.n_interior_edges == 0
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    A = V.integrate_bilinear_form(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    assert A.shape == (3, 3)
    # all DOFs are boundary: reduce yields an empty system
    assert V.reduce(A).shape == (0, 0)


def test_parallel_fractures_no_traces():
    """Two parallel fractures: glued mesh has no shared vertices."""
    f1 = [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]
    f2 = [[0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
    mesh = build_fracture_network([f1, f2], h=0.5)
    assert mesh["global", "traces_vertices_idx"].shape[0] == 0
    assert np.asarray(mesh["interior_edges", "trace_mask"]).sum() == 0
    # the glued system is block-diagonal; each block solves independently
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    u = V.solve_iterative(
        V.integrate_bilinear_form_local(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        ),
        V.integrate_linear_form(lambda b: b.v),
        tol=1e-10,
    )
    assert np.isfinite(np.asarray(u)).all()


def test_touching_fractures_share_single_line():
    """Fractures meeting exactly at a shared boundary edge (T-joint)."""
    f1 = [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]]  # z=0
    f2 = [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]]  # y=0, touching along y=z=0
    mesh = build_fracture_network([f1, f2], h=0.5)
    tv = np.asarray(mesh["global", "vertices_3d"])[
        np.asarray(mesh["global", "traces_vertices_idx"])[:, 0]
    ]
    # shared line y=z=0 glued
    assert len(tv) >= 3
    np.testing.assert_allclose(tv[:, 1], 0.0, atol=1e-9)
    np.testing.assert_allclose(tv[:, 2], 0.0, atol=1e-9)


def test_pslg_no_interior_constraints():
    out = triangulate_pslg(
        np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]]),
        np.array([[0, 1], [1, 2], [2, 3], [3, 0]]),
        h=0.3,
    )
    mesh = fem.MeshTri(out)
    areas = 0.5 * np.abs(
        np.linalg.det(
            np.asarray(mesh["cells", "coordinates"])[:, 1:, :]
            - np.asarray(mesh["cells", "coordinates"])[:, :1, :]
        )
    )
    assert abs(areas.sum() - 1.0) < 1e-12


def test_non_rectangular_fracture_rejected():
    bad = [[0, 0, 0], [1, 0, 0], [1.5, 1.2, 0], [0, 1, 0]]
    with pytest.raises(ValueError, match="rectangle"):
        build_fracture_network([bad], h=0.5)


def test_patches_single_patch_batch_of_one():
    patches = fem.Patches([[0.5, 0.5]], [[0.25]])
    VP = fem.PatchesBasis(patches, fem.ElementTri(1, 2))
    u = VP.solve(
        VP.integrate_bilinear_form(
            lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
        ),
        VP.solution_tensor(),
        VP.integrate_linear_form(lambda b: b.v),
    )
    assert u.shape == (1, 5, 1)
    assert np.isfinite(np.asarray(u)).all()


def test_empty_spill_hybrid_ell():
    """max_k above the true max degree produces an empty spill tail."""
    from pytorch_fem_solver_tpu.ops.sparse import (
        build_ell_structure,
        ell_matvec,
        ell_values_from_local,
    )

    mesh = fem.MeshTri(fem.unit_square(n=5))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    local = V.integrate_bilinear_form_local(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    st = build_ell_structure(
        np.asarray(V._global_dofs4elements),
        V.n_dofs,
        np.asarray(V._basis_parameters["inner_dofs"]),
        max_k=50,
    )
    assert st.spill_rows.shape[0] == 0
    vals = ell_values_from_local(st, local)
    A = np.asarray(V.reduce(V.integrate_bilinear_form(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad))))
    x = jnp.asarray(np.random.default_rng(0).normal(size=A.shape[0]))
    np.testing.assert_allclose(
        np.asarray(ell_matvec(st, vals, x)), A @ np.asarray(x), atol=1e-12
    )
