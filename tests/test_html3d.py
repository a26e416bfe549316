"""Self-contained WebGL export (utils/html3d.py): the pyvista-parity
interactive render path. Checks geometry extraction, both coloring modes,
the trace overlay, and that the written file is standalone (no external
URLs) with an embedded, parseable data payload."""

import json
import re

import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.utils import build_benchmark_network
from pytorch_fem_solver_tpu.utils.html3d import (
    export_network_html,
    viridis_rgb,
)


def _payload(path):
    text = open(path).read()
    assert "<canvas" in text
    assert "http://" not in text and "https://" not in text, (
        "viewer must be standalone (zero-egress environments)"
    )
    m = re.search(r"const D=(\{.*?\});\n", text, re.S)
    assert m, "embedded data payload not found"
    return json.loads(m.group(1)), text


def test_viridis_rgb_range():
    rgb = viridis_rgb(np.linspace(0, 1, 7))
    assert rgb.shape == (7, 3)
    assert (rgb >= 0).all() and (rgb <= 1).all()
    # endpoints match the table
    np.testing.assert_allclose(rgb[0], [0.267004, 0.004874, 0.329415])


def test_export_dfn_vertex_and_cell_modes(tmp_path):
    mesh = build_benchmark_network(h=0.5)
    n_flat = np.asarray(mesh["vertices", "coordinates_3d"]).shape[0]
    n_global = np.asarray(mesh["global", "vertices_3d"]).shape[0]
    n_cells = int(mesh.n_cells)

    # solutions live in the glued GLOBAL numbering (FractureNetworkBasis
    # P1 DOFs); the exporter gathers them onto the flat vertices
    u = np.sin(np.arange(n_global, dtype=np.float64))
    p1 = export_network_html(
        mesh, str(tmp_path / "sol.html"), vertex_values=u, title="u"
    )
    d, _ = _payload(p1)
    assert d["n_verts"] == n_flat and d["n_cells"] == n_cells
    assert len(d["positions"]) == 3 * n_flat
    assert len(d["colors"]) == 3 * n_flat
    assert len(d["indices"]) == 3 * n_cells
    assert len(d["lines"]) > 0, "DFN export should carry trace segments"
    assert d["vmax"] > d["vmin"]

    err = np.abs(np.cos(np.arange(n_cells, dtype=np.float64)))
    p2 = export_network_html(
        mesh, str(tmp_path / "err.html"), cell_values=err, title="err"
    )
    d2, _ = _payload(p2)
    # flat shading splits shared vertices: 3 per cell
    assert len(d2["positions"]) == 9 * n_cells
    assert len(d2["indices"]) == 3 * n_cells

    # geometry-only: per-fracture constant colors
    p3 = export_network_html(mesh, str(tmp_path / "geo.html"))
    d3, _ = _payload(p3)
    assert len(d3["indices"]) == 3 * n_cells


def test_export_planar_mesh_and_validation(tmp_path):
    mesh = fem.MeshTri(fem.unit_square(n=4))
    n_verts = np.asarray(mesh["vertices", "coordinates"]).shape[0]
    p = export_network_html(
        mesh,
        str(tmp_path / "sq.html"),
        vertex_values=np.arange(n_verts, dtype=np.float64),
    )
    d, _ = _payload(p)
    assert d["n_verts"] == n_verts

    with pytest.raises(ValueError, match="not both"):
        export_network_html(
            mesh,
            str(tmp_path / "x.html"),
            vertex_values=np.zeros(n_verts),
            cell_values=np.zeros(int(mesh.n_cells)),
        )
    with pytest.raises(ValueError, match="entries"):
        export_network_html(
            mesh, str(tmp_path / "y.html"), vertex_values=np.zeros(3)
        )
