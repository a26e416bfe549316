"""Visualization helpers (matplotlib, no pyvista dependency).

Covers the reference's visual outputs: per-cell scalar maps on 2D meshes
(PolyCollection, example_weak.py:181-201), 3D fracture-network renders with
per-cell solution coloring, and trace-line plots
(example_fractures_fem.py:349-484 / test scripts plot_fractures.py,
save_fig_fractures.py — pyvista there).
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    try:
        import matplotlib.pyplot as plt

        return plt
    except Exception:  # pragma: no cover
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt


def plot_cellwise(mesh, values, label: str = "", ax=None):
    """Per-cell scalar map on a 2D triangle mesh (PolyCollection)."""
    from matplotlib.collections import PolyCollection

    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    coords = np.asarray(mesh["cells", "coordinates"])
    collection = PolyCollection(
        coords,
        array=np.asarray(values).reshape(-1),
        cmap="viridis",
        edgecolors="black",
        linewidths=0.2,
    )
    ax.add_collection(collection)
    ax.autoscale_view()
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.figure.colorbar(collection, ax=ax, label=label)
    return ax


def plot_network_3d(mesh, vertex_values=None, show_traces: bool = True, ax=None):
    """3D render of a fracture network with optional nodal coloring.

    Works with :class:`FractureNetworkMesh` (flat) meshes; each fracture's
    triangles are drawn via plot_trisurf, traces highlighted as black lines.
    """
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection

    plt = _plt()
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")

    verts3d = np.asarray(mesh["vertices", "coordinates_3d"])
    cells = np.asarray(mesh["cells", "vertices"])
    polys = verts3d[cells]

    if vertex_values is not None:
        vals = np.asarray(vertex_values).reshape(-1)
        cell_vals = vals[cells].mean(axis=1)
        normed = (cell_vals - cell_vals.min()) / max(
            cell_vals.max() - cell_vals.min(), 1e-300
        )
        import matplotlib.cm as cm

        facecolors = cm.viridis(normed)
    else:
        facecolors = (0.4, 0.6, 0.9, 0.4)

    collection = Poly3DCollection(
        polys, facecolors=facecolors, edgecolors="gray", linewidths=0.1
    )
    ax.add_collection3d(collection)

    if show_traces and ("interior_edges", "trace_mask") in mesh:
        tm = np.asarray(mesh["interior_edges", "trace_mask"])[:, 0].astype(bool)
        trace_coords = np.asarray(mesh["interior_edges", "coordinates_3d"])[tm]
        for seg in trace_coords:
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "k-", linewidth=1.5)

    lo = verts3d.min(axis=0)
    hi = verts3d.max(axis=0)
    ax.set_xlim(lo[0], hi[0])
    ax.set_ylim(lo[1], hi[1])
    ax.set_zlim(lo[2], hi[2])
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")
    return ax


def plot_trace_profile(mesh, edge_values, label: str = "", ax=None):
    """Values along trace edges, sorted by arc position (jump plots)."""
    plt = _plt()
    if ax is None:
        _, ax = plt.subplots()
    tm = np.asarray(mesh["interior_edges", "trace_mask"])[:, 0].astype(bool)
    mids = np.asarray(mesh["interior_edges", "coordinates_3d"]).mean(axis=1)[tm]
    vals = np.asarray(edge_values).reshape(-1)[tm]
    # order by the dominant coordinate direction of the trace
    spans = mids.max(axis=0) - mids.min(axis=0)
    axis_dim = int(np.argmax(spans))
    order = np.argsort(mids[:, axis_dim])
    ax.plot(mids[order, axis_dim], vals[order], "o-", label=label or None)
    ax.set_xlabel("xyz"[axis_dim] + " along trace")
    if label:
        ax.legend()
    return ax
