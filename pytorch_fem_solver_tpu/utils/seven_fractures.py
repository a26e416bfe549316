"""Loader for the reference's ``examples/seven_fractures`` dataset + the DFN
benchmark geometry.

The reference ships this geometry as raw text (fracture corner images, 2D
vertices with markers, PSLG segments with markers) but contains **no loader**
— no script reads these files (SURVEY.md §2). File semantics, reverse-
engineered from the data:

* ``fracture_data.txt``: blank-line-separated blocks of three ``x y z`` rows
  — the 3D images of each fracture's first three 2D vertices (the anchor
  convention of ``FracturesTri``, fractures_tri.py:37-39);
* ``vertices_data.txt``: blocks of ``x y marker`` rows — local 2D PSLG
  vertices per fracture;
* ``triangles_data.txt``: despite the name, blocks of ``a b marker``
  *segment* rows (PSLG constraints: marker 0 = interior trace, nonzero =
  domain boundary).

Note the shipped data is a work-in-progress: fracture 2 is slanted and its
trace across fracture 1 is not present in fracture 1's constraint set, so
meshing the raw PSLGs directly cannot conform. ``seven_fractures_rectangles``
therefore extracts each fracture's *rectangle* from the data and lets
``build_fracture_network`` derive all traces geometrically.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..mesh.dfn import build_fracture_network
from ..mesh.fracture_network import FractureNetworkMesh, fit_affine_maps

REFERENCE_DATA_DIR = "/root/reference/examples/seven_fractures"

__all__ = [
    "load_seven_fractures_raw",
    "seven_fractures_rectangles",
    "benchmark_seven_fracture_geometry",
    "build_benchmark_network",
]


def _read_blocks(path: str) -> List[np.ndarray]:
    blocks, current = [], []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                if current:
                    blocks.append(np.asarray(current, dtype=np.float64))
                    current = []
            else:
                current.append([float(x) for x in line.split()])
    if current:
        blocks.append(np.asarray(current, dtype=np.float64))
    return blocks


def load_seven_fractures_raw(data_dir: Optional[str] = None) -> List[dict]:
    """Parse the dataset into per-fracture PSLG dicts.

    Returns a list of dicts with keys ``vertices`` (n, 2), ``vertex_labels``
    (n,), ``segments`` (m, 2), ``segment_markers`` (m,), ``corners_3d``
    (3, 3) — the images of the first three vertices.
    """
    if data_dir is None:
        data_dir = REFERENCE_DATA_DIR
    corners = _read_blocks(os.path.join(data_dir, "fracture_data.txt"))
    verts = _read_blocks(os.path.join(data_dir, "vertices_data.txt"))
    segs = _read_blocks(os.path.join(data_dir, "triangles_data.txt"))
    if not (len(corners) == len(verts) == len(segs)):
        raise ValueError(
            f"inconsistent block counts: {len(corners)} fracture blocks, "
            f"{len(verts)} vertex blocks, {len(segs)} segment blocks"
        )
    out = []
    for c, v, s in zip(corners, verts, segs):
        out.append(
            {
                "vertices": v[:, :2],
                "vertex_labels": v[:, 2].astype(np.int64),
                "segments": s[:, :2].astype(np.int64),
                "segment_markers": s[:, 2].astype(np.int64),
                "corners_3d": c[:3],
            }
        )
    return out


def seven_fractures_rectangles(data_dir: Optional[str] = None):
    """Each fracture's 3D rectangle, reconstructed from the raw data.

    The 2D bounding box corners of each fracture's PSLG vertices are mapped
    through the affine fit (anchors = first three vertices -> corners_3d).
    """
    raw = load_seven_fractures_raw(data_dir)
    anchors = np.stack([f["vertices"][:3] for f in raw])
    corners3 = np.stack([f["corners_3d"] for f in raw])
    jac, trans, _, _ = fit_affine_maps(anchors, corners3)

    rects = []
    for f, fracture in enumerate(raw):
        v = fracture["vertices"]
        lo = v.min(axis=0)
        hi = v.max(axis=0)
        box2d = np.array(
            [[lo[0], lo[1]], [hi[0], lo[1]], [hi[0], hi[1]], [lo[0], hi[1]]]
        )
        rects.append((jac[f] @ box2d.T + trans[f]).T)
    return rects


def benchmark_seven_fracture_geometry():
    """The framework's deterministic 7-fracture benchmark network.

    Seven axis-aligned rectangles forming a densely connected network (every
    vertical fracture crosses the horizontal ones and its perpendicular
    peers), producing 21+ traces with triple points — the workload class the
    BASELINE metric targets. Geometry is fixed so benchmark numbers are
    comparable across rounds.
    """
    return [
        np.asarray(r, dtype=np.float64)
        for r in [
            [[0, 0, 0], [4, 0, 0], [4, 4, 0], [0, 4, 0]],  # z = 0
            [[1, 0, -2], [1, 4, -2], [1, 4, 2], [1, 0, 2]],  # x = 1
            [[3, 0, -2], [3, 4, -2], [3, 4, 2], [3, 0, 2]],  # x = 3
            [[0, 1, -2], [4, 1, -2], [4, 1, 2], [0, 1, 2]],  # y = 1
            [[0, 3, -2], [4, 3, -2], [4, 3, 2], [0, 3, 2]],  # y = 3
            [[0.5, 0.5, -1], [3.5, 0.5, -1], [3.5, 3.5, -1], [0.5, 3.5, -1]],
            [[0.5, 0.5, 1], [3.5, 0.5, 1], [3.5, 3.5, 1], [0.5, 3.5, 1]],
        ]
    ]


def build_benchmark_network(h: float) -> FractureNetworkMesh:
    """Conforming mesh of the benchmark network at edge length h."""
    return build_fracture_network(benchmark_seven_fracture_geometry(), h=h)
