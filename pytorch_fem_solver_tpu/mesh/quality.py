"""Mesh quality metrics: triangle min-angles and quality reports.

The reference delegates quality meshing to the ``triangle`` library's "q"
flag (min-angle >= 20 degrees by default, e.g.
/root/reference/examples/example_fractures_fem.py:44-46). Here quality is a
measured, asserted property: ``triangle_min_angles`` is the metric,
``quality_report`` the summary, and ``triangulate_pslg(min_angle=...)``
the enforcement knob (Lloyd-style smoothing of free points).
"""

from __future__ import annotations

import numpy as np

__all__ = ["triangle_min_angles", "quality_report"]


def triangle_min_angles(vertices, triangles) -> np.ndarray:
    """Per-triangle minimum interior angle in degrees, shape (T,)."""
    p = np.asarray(vertices, dtype=np.float64)[np.asarray(triangles)]
    mins = None
    for i in range(3):
        a = p[:, (i + 1) % 3] - p[:, i]
        b = p[:, (i + 2) % 3] - p[:, i]
        na = np.linalg.norm(a, axis=-1)
        nb = np.linalg.norm(b, axis=-1)
        cos = (a * b).sum(-1) / np.where(na * nb > 0, na * nb, 1.0)
        ang = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
        mins = ang if mins is None else np.minimum(mins, ang)
    return mins


def quality_report(vertices, triangles) -> dict:
    """Quality summary: min / percentile min-angles and area statistics."""
    angles = triangle_min_angles(vertices, triangles)
    p = np.asarray(vertices, dtype=np.float64)[np.asarray(triangles)]
    areas = 0.5 * np.abs(
        (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1])
        - (p[:, 1, 1] - p[:, 0, 1]) * (p[:, 2, 0] - p[:, 0, 0])
    )
    return {
        "min_angle": float(angles.min()),
        "p1_angle": float(np.percentile(angles, 1)),
        "median_angle": float(np.median(angles)),
        "min_area": float(areas.min()),
        "max_area": float(areas.max()),
        "total_area": float(areas.sum()),
        "n_triangles": int(len(angles)),
    }
