"""Patches + batched assembly: self-consistency with the standard basis.

Parity with the reference doctrine (tests/test_assembly_patches.py:57-74): a
single patch covering the unit square must reproduce the standard ``Basis``
stiffness/load exactly; batched patches solve all local problems in one shot.
"""

import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh.patches import (
    MARKERS_4_VERTICES,
    SIGNS_4_VERTICES,
    VERTICES_4_CELLS_4_PATCH,
)


def stiffness(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def load(basis):
    x = basis.integration_points[..., 0:1]
    y = basis.integration_points[..., 1:2]
    return (x + 2.0 * y) * basis.v


def test_single_patch_matches_standard_basis():
    patches = fem.Patches(centers=[[0.5, 0.5]], radius=[[0.5]])
    VP = fem.PatchesBasis(patches, fem.ElementTri(1, 2))

    mesh = fem.MeshTri(
        {
            "vertices": SIGNS_4_VERTICES * 0.5 + 0.5,
            "triangles": VERTICES_4_CELLS_4_PATCH,
            "vertex_markers": MARKERS_4_VERTICES,
        }
    )
    V = fem.Basis(mesh, fem.ElementTri(1, 2))

    A_b = np.asarray(VP.integrate_bilinear_form(stiffness))
    A = np.asarray(V.integrate_bilinear_form(stiffness))
    assert A_b.shape == (1, 5, 5)
    np.testing.assert_allclose(A_b[0], A, atol=1e-14)

    b_b = np.asarray(VP.integrate_linear_form(load))
    b = np.asarray(V.integrate_linear_form(load))
    np.testing.assert_allclose(b_b[0], b, atol=1e-14)


def test_batched_patch_solve():
    """B independent local Poisson problems in one batched solve."""
    rng = np.random.default_rng(0)
    B = 7
    centers = rng.uniform(0.3, 0.7, size=(B, 2))
    radius = rng.uniform(0.05, 0.2, size=(B, 1))
    patches = fem.Patches(centers, radius)
    VP = fem.PatchesBasis(patches, fem.ElementTri(1, 2))

    A = VP.integrate_bilinear_form(stiffness)
    b = VP.integrate_linear_form(load)
    u = VP.solve(A, VP.solution_tensor(), b)
    assert u.shape == (B, 5, 1)

    # each batch entry must equal its standalone solve
    for i in range(B):
        mesh_i = fem.MeshTri(
            {
                "vertices": np.asarray(patches["vertices", "coordinates"])[i],
                "triangles": VERTICES_4_CELLS_4_PATCH,
                "vertex_markers": MARKERS_4_VERTICES,
            }
        )
        V_i = fem.Basis(mesh_i, fem.ElementTri(1, 2))
        u_i = V_i.solve(
            V_i.integrate_bilinear_form(stiffness),
            V_i.solution_tensor(),
            V_i.integrate_linear_form(load),
        )
        np.testing.assert_allclose(np.asarray(u)[i], np.asarray(u_i), atol=1e-12)


def test_reduce_shapes():
    patches = fem.Patches([[0.5, 0.5], [0.2, 0.3]], [[0.1], [0.05]])
    VP = fem.PatchesBasis(patches, fem.ElementTri(1, 2))
    A = VP.integrate_bilinear_form(stiffness)
    b = VP.integrate_linear_form(load)
    assert VP.reduce(A).shape == (2, 1, 1)  # only the center DOF is interior
    assert VP.reduce(b).shape == (2, 1, 1)


def test_refine_patches():
    patches = fem.Patches([[0.5, 0.5], [0.25, 0.25]], [[0.25], [0.125]])
    centers, radius, coords = patches.refine_patches(np.array([True, False]))
    # 1 kept + 4 children + 1 rotated = 6
    assert centers.shape == (6, 2)
    assert radius.shape == (6, 1)
    assert coords.shape == (6, 5, 2)
    # children have half the radius; rotated patch sqrt(2)/2 of original
    np.testing.assert_allclose(np.asarray(radius[1:5, 0]), 0.125)
    np.testing.assert_allclose(float(radius[5, 0]), 0.25 / np.sqrt(2.0))
    # refined set is constructible
    refined = fem.Patches(centers, radius)
    assert refined.batch_size() == (6,)


def test_uniform_refine_compounds():
    patches = fem.Patches([[0.5, 0.5]], [[0.5]])
    centers, radius, _ = patches.uniform_refine(2)
    # each pass: B -> 5B
    assert centers.shape[0] == 25
    assert float(jnp.max(radius)) <= 0.5 / np.sqrt(2.0) + 1e-12


def test_batched_patch_p2_matches_standalone():
    """P2 PatchesBasis (beyond the reference's P1-only patches): batched
    quadratic local solves equal their standalone Basis P2 solves, matched
    through the DOF coordinates (edge numbering differs between the patch
    template and MeshTri's edge table)."""
    rng = np.random.default_rng(1)
    B = 5
    centers = rng.uniform(0.3, 0.7, size=(B, 2))
    radius = rng.uniform(0.05, 0.2, size=(B, 1))
    patches = fem.Patches(centers, radius)
    VP = fem.PatchesBasis(patches, fem.ElementTri(2, 4))

    # partition of unity on the quadratic tables
    assert np.abs(np.asarray(VP.v).sum(-2) - 1.0).max() < 1e-13

    A = VP.integrate_bilinear_form(stiffness)
    b = VP.integrate_linear_form(load)
    u = VP.solve(A, VP.solution_tensor(), b)
    assert u.shape == (B, 13, 1)  # 5 vertices + 8 edge midpoints

    coords_b = np.asarray(VP._coords4global_dofs)  # (B, 13, 2)
    for i in range(B):
        mesh_i = fem.MeshTri(
            {
                "vertices": np.asarray(patches["vertices", "coordinates"])[i],
                "triangles": VERTICES_4_CELLS_4_PATCH,
                "vertex_markers": MARKERS_4_VERTICES,
            }
        )
        V_i = fem.Basis(mesh_i, fem.ElementTri(2, 4))
        u_i = np.asarray(
            V_i.solve(
                V_i.integrate_bilinear_form(stiffness),
                V_i.solution_tensor(),
                V_i.integrate_linear_form(load),
            )
        )
        # match batched DOFs to standalone DOFs by coordinates
        coords_i = np.asarray(V_i._coords4global_dofs)
        dist = np.linalg.norm(
            coords_b[i][:, None, :] - coords_i[None, :, :], axis=-1
        )
        perm = dist.argmin(axis=1)
        assert dist.min(axis=1).max() < 1e-12  # bijection on this geometry
        assert len(set(perm.tolist())) == 13
        np.testing.assert_allclose(
            np.asarray(u)[i, :, 0], u_i[perm, 0], atol=1e-12
        )


def test_batched_patch_p3_matches_standalone():
    """P3 PatchesBasis (the last order-matrix cell): batched cubic local
    solves equal their standalone Basis P3 solves, matched through the DOF
    coordinates (edge numbering and orientation differ between the patch
    template and MeshTri's edge table — the coordinate match also pins the
    1/3-2/3 edge-node orientation)."""
    rng = np.random.default_rng(4)
    B = 4
    centers = rng.uniform(0.3, 0.7, size=(B, 2))
    radius = rng.uniform(0.05, 0.2, size=(B, 1))
    patches = fem.Patches(centers, radius)
    VP = fem.PatchesBasis(patches, fem.ElementTri(3, 5))

    # partition of unity on the cubic tables
    assert np.abs(np.asarray(VP.v).sum(-2) - 1.0).max() < 1e-12

    A = VP.integrate_bilinear_form(stiffness)
    b = VP.integrate_linear_form(load)
    u = VP.solve(A, VP.solution_tensor(), b)
    n_dofs = 5 + 2 * 8 + 4  # vertices + 2 per edge + cell bubbles
    assert u.shape == (B, n_dofs, 1)

    coords_b = np.asarray(VP._coords4global_dofs)
    for i in range(B):
        mesh_i = fem.MeshTri(
            {
                "vertices": np.asarray(patches["vertices", "coordinates"])[i],
                "triangles": VERTICES_4_CELLS_4_PATCH,
                "vertex_markers": MARKERS_4_VERTICES,
            }
        )
        V_i = fem.Basis(mesh_i, fem.ElementTri(3, 5))
        u_i = np.asarray(
            V_i.solve(
                V_i.integrate_bilinear_form(stiffness),
                V_i.solution_tensor(),
                V_i.integrate_linear_form(load),
            )
        )
        coords_i = np.asarray(V_i._coords4global_dofs)
        dist = np.linalg.norm(
            coords_b[i][:, None, :] - coords_i[None, :, :], axis=-1
        )
        perm = dist.argmin(axis=1)
        assert dist.min(axis=1).max() < 1e-12
        assert len(set(perm.tolist())) == n_dofs
        np.testing.assert_allclose(
            np.asarray(u)[i, :, 0], u_i[perm, 0], atol=1e-11
        )
