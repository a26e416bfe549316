"""Mesh construction and derived-topology invariants."""

import numpy as np
import pytest

from pytorch_fem_solver_tpu import MeshTri, rectangle, refine_uniform, unit_square
from pytorch_fem_solver_tpu.mesh.generation import triangulation_max_area


@pytest.mark.parametrize("pattern", ["right", "alternating", "crisscross"])
def test_rectangle_counts(pattern):
    nx, ny = 4, 3
    tri = rectangle(nx, ny, pattern=pattern)
    mesh = MeshTri(tri)
    if pattern == "crisscross":
        assert mesh.n_cells == 4 * nx * ny
        assert mesh.n_vertices == (nx + 1) * (ny + 1) + nx * ny
    else:
        assert mesh.n_cells == 2 * nx * ny
        assert mesh.n_vertices == (nx + 1) * (ny + 1)
    # Euler characteristic of a disk: V - E + F = 1
    n_edges = mesh["edges", "vertices"].shape[0]
    assert mesh.n_vertices - n_edges + mesh.n_cells == 1


def test_positive_orientation_and_areas():
    tri = rectangle(5, 5, pattern="alternating")
    v = np.asarray(tri["vertices"])
    t = np.asarray(tri["triangles"])
    p = v[t]
    cross = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
        p[:, 1, 1] - p[:, 0, 1]
    ) * (p[:, 2, 0] - p[:, 0, 0])
    assert (cross > 0).all(), "triangles must be positively oriented"
    assert abs(0.5 * cross.sum() - 1.0) < 1e-12


def test_boundary_markers():
    mesh = MeshTri(unit_square(n=4))
    coords = np.asarray(mesh["vertices", "coordinates"])
    markers = np.asarray(mesh["vertices", "markers"]).reshape(-1)
    on_boundary = (
        (coords[:, 0] == 0)
        | (coords[:, 0] == 1)
        | (coords[:, 1] == 0)
        | (coords[:, 1] == 1)
    )
    np.testing.assert_array_equal(markers.astype(bool), on_boundary)


def test_interior_edge_normals():
    mesh = MeshTri(unit_square(n=3))
    normals = np.asarray(mesh["interior_edges", "normals"])  # (Ei, 1, 2)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0, atol=1e-13)

    # orientation: normal points from first adjacent cell toward the second
    cells = np.asarray(mesh["interior_edges", "cells"])
    centroids = np.asarray(mesh["cells", "coordinates"]).mean(axis=1)
    d = centroids[cells[:, 1]] - centroids[cells[:, 0]]
    dots = (normals[:, 0] * d).sum(-1)
    assert (dots > 0).all()

    # normals are perpendicular to their edges
    p = np.asarray(mesh["interior_edges", "coordinates"])
    vec = p[:, 1] - p[:, 0]
    np.testing.assert_allclose((normals[:, 0] * vec).sum(-1), 0.0, atol=1e-13)


def test_interior_edge_cells_share_edge():
    mesh = MeshTri(unit_square(n=4))
    cells = np.asarray(mesh["interior_edges", "cells"])
    edge_verts = np.asarray(mesh["interior_edges", "vertices"])
    tri = np.asarray(mesh["cells", "vertices"])
    for (c1, c2), (a, b) in zip(cells, edge_verts):
        assert {a, b} <= set(tri[c1])
        assert {a, b} <= set(tri[c2])


def test_refine_uniform():
    tri = unit_square(n=2)
    fine = refine_uniform(tri)
    assert fine["triangles"].shape[0] == 4 * tri["triangles"].shape[0]
    assert triangulation_max_area(fine) == pytest.approx(
        triangulation_max_area(tri) / 4
    )
    mesh = MeshTri(fine)
    coords = np.asarray(mesh["vertices", "coordinates"])
    markers = np.asarray(fine["vertex_markers"]).reshape(-1)
    on_boundary = (
        (coords[:, 0] == 0)
        | (coords[:, 0] == 1)
        | (coords[:, 1] == 0)
        | (coords[:, 1] == 1)
    )
    np.testing.assert_array_equal(markers.astype(bool), on_boundary)


def test_cells_min_length():
    mesh = MeshTri(unit_square(n=4))
    length = np.asarray(mesh["cells", "length"])
    assert length.shape == (mesh.n_cells, 1, 1, 1)
    np.testing.assert_allclose(length.reshape(-1), 0.25, atol=1e-13)
