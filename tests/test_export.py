"""VTK export + mesh.refined() convenience."""

import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube
from pytorch_fem_solver_tpu.utils import write_vtk


def test_write_vtk_triangles_roundtrip(tmp_path):
    tri = fem.unit_square(n=2)
    v, t = tri["vertices"], tri["triangles"]
    u = np.arange(v.shape[0], dtype=float)
    disp = np.stack([u, -u], axis=1)  # 2-component vector, padded to 3
    path = write_vtk(
        tmp_path / "m.vtk", v, t, point_data={"u": u, "disp": disp}
    )
    text = open(path).read().splitlines()
    assert text[0].startswith("# vtk DataFile")
    assert f"POINTS {v.shape[0]} double" in text
    assert f"CELLS {t.shape[0]} {t.shape[0] * 4}" in text
    assert f"CELL_TYPES {t.shape[0]}" in text
    assert "SCALARS u double 1" in text
    assert "VECTORS disp double" in text
    # every cell line starts with its arity and valid ids
    start = text.index(f"CELLS {t.shape[0]} {t.shape[0] * 4}") + 1
    for line in text[start : start + t.shape[0]]:
        parts = line.split()
        assert parts[0] == "3"
        assert all(0 <= int(i) < v.shape[0] for i in parts[1:])
    # scalar payload intact
    s_start = text.index("LOOKUP_TABLE default") + 1
    vals = [float(x) for x in text[s_start : s_start + v.shape[0]]]
    np.testing.assert_allclose(vals, u)


def test_write_vtk_tets_and_validation(tmp_path):
    tri = unit_cube(1)
    path = write_vtk(
        tmp_path / "c.vtk", tri["vertices"], tri["tetrahedra"]
    )
    text = open(path).read()
    assert "CELL_TYPES 6" in text and "\n10\n" in text
    with pytest.raises(ValueError):
        write_vtk(tmp_path / "x.vtk", tri["vertices"][:, :1], tri["tetrahedra"])
    with pytest.raises(ValueError):
        write_vtk(
            tmp_path / "x.vtk",
            tri["vertices"],
            np.array([[0, 1, 2, 99999]]),
        )
    with pytest.raises(ValueError):
        write_vtk(
            tmp_path / "x.vtk",
            tri["vertices"],
            tri["tetrahedra"],
            point_data={"bad": np.zeros((3, 1))},
        )


def test_mesh_refined_convenience():
    """MeshTri.refined / MeshTet.refined mirror the functional refiners."""
    mesh2 = fem.MeshTri(fem.unit_square(n=3))
    marked = np.zeros(mesh2.n_cells, dtype=bool)
    marked[:4] = True
    ref2 = mesh2.refined(marked)
    assert isinstance(ref2, fem.MeshTri)
    assert ref2.n_cells > mesh2.n_cells

    mesh3 = MeshTet(unit_cube(2))
    marked3 = np.zeros(mesh3.n_cells, dtype=bool)
    marked3[::7] = True
    ref3 = mesh3.refined(marked3)
    assert isinstance(ref3, MeshTet)
    assert ref3.n_cells > mesh3.n_cells
    # conforming: a basis builds and the total volume is preserved
    import jax.numpy as jnp

    from pytorch_fem_solver_tpu.element import ElementTet

    V = fem.Basis(ref3, ElementTet(1, 2))
    vol = float(V.integrate_functional(lambda b_: jnp.ones(1)).sum())
    assert abs(vol - 1.0) < 1e-12
