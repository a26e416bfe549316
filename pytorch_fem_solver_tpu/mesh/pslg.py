"""Conforming Delaunay triangulation of planar straight-line graphs (PSLGs).

Fills the role of the external ``triangle`` library in the reference
(``tr.triangulate({vertices, segments}, "pqsena...")``, e.g.
example_fractures_fem.py:44-46) with a native implementation:

1. every constraint segment is subdivided into sub-edges of length <= h
   (Steiner points), with an explicitly controllable division count so two
   meshes sharing a physical line can sample it identically (required for
   cross-fracture conformity in DFNs);
2. a background grid fills the domain interior, with a clearance band around
   constraint segments so their diametral circles stay empty;
3. scipy's Delaunay (qhull) triangulates the point set — with the clearance
   respected, all constraint sub-edges appear in the triangulation, which is
   verified and enforced;
4. if the boundary segments (nonzero markers) form closed loops, triangles
   outside the domain are discarded by even-odd containment — non-convex
   outlines and interior holes work; open boundaries fall back to the
   convex hull (identical result for convex domains);
5. optional ``min_angle``: Lloyd-style smoothing of the free background
   points until every triangle's minimum angle clears the floor (the role
   of the triangle library's "q" flag); raises if unattainable.

All host-side NumPy; runs once at setup. Quality metrics live in
``mesh.quality``.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import Delaunay

__all__ = ["triangulate_pslg", "segment_divisions"]


def _points_in_loops(points, loop_a, loop_b):
    """Even-odd containment of points w.r.t. closed boundary loops.

    loop_a/loop_b: (S, 2) segment endpoints. Half-open crossing rule keeps
    shared loop vertices from double-counting. Points ON the boundary are
    ambiguous — callers keep such points away via the clearance band.
    """
    x = points[:, 0:1]
    y = points[:, 1:2]
    x1, y1 = loop_a[:, 0][None], loop_a[:, 1][None]
    x2, y2 = loop_b[:, 0][None], loop_b[:, 1][None]
    crosses = (y1 <= y) != (y2 <= y)
    dy = np.where(y2 - y1 != 0, y2 - y1, 1.0)
    x_at = x1 + (y - y1) * (x2 - x1) / dy
    return ((crosses & (x < x_at)).sum(axis=1) % 2) == 1


def _closed_boundary(vertices, segments, segment_markers):
    """(seg_a, seg_b) of the boundary loops, or None if they don't close
    (every boundary vertex must have even incidence)."""
    boundary = segments[segment_markers != 0]
    if len(boundary) == 0:
        return None
    counts = np.bincount(boundary.reshape(-1), minlength=len(vertices))
    if (counts % 2 != 0).any():
        return None
    return vertices[boundary[:, 0]], vertices[boundary[:, 1]]


def segment_divisions(lengths: np.ndarray, h: float) -> np.ndarray:
    """Number of sub-edges per segment for target edge length h (>= 1)."""
    return np.maximum(1, np.ceil(np.asarray(lengths, dtype=float) / h)).astype(
        np.int64
    )


def _sample_segments(vertices, segments, divisions):
    """Steiner points on each segment (excluding endpoints).

    Returns (points (M, 2), owner_segment (M,)) plus, per segment, the index
    chain [v0, s..., v1] describing its sub-edges — endpoint indices refer to
    the input vertex array; interior samples are offset later.
    """
    points = []
    chains = []
    owners = []
    count = 0
    for s, (a, b) in enumerate(segments):
        n_div = int(divisions[s])
        pa, pb = vertices[a], vertices[b]
        ts = np.linspace(0.0, 1.0, n_div + 1)[1:-1]
        seg_pts = pa[None] + ts[:, None] * (pb - pa)[None]
        idx = np.arange(count, count + len(seg_pts))
        chains.append((a, idx, b))
        owners.extend([s] * len(seg_pts))
        points.append(seg_pts)
        count += len(seg_pts)
    all_pts = (
        np.concatenate(points, axis=0) if points else np.zeros((0, 2))
    )
    return all_pts, np.asarray(owners, dtype=np.int64), chains


def _point_segment_distance(points, seg_a, seg_b):
    """Distance from each point to each segment: (N, S) matrix."""
    d = seg_b - seg_a  # (S, 2)
    len2 = (d**2).sum(-1)  # (S,)
    ap = points[:, None, :] - seg_a[None]  # (N, S, 2)
    t = np.clip((ap * d[None]).sum(-1) / np.where(len2 > 0, len2, 1.0), 0.0, 1.0)
    closest = seg_a[None] + t[..., None] * d[None]
    return np.linalg.norm(points[:, None, :] - closest, axis=-1)


def triangulate_pslg(
    vertices,
    segments,
    h: float,
    segment_markers=None,
    divisions=None,
    clearance: float = 0.45,
    max_retries: int = 3,
    min_angle: float | None = None,
):
    """Triangulate a PSLG with max edge length ~ h.

    Args:
      vertices: (n, 2) PSLG vertices (domain corners + segment endpoints).
      segments: (m, 2) vertex-index pairs (boundary + interior constraints).
      h: target edge length.
      segment_markers: (m,) int labels; 0 = interior constraint, nonzero =
        domain boundary (value preserved onto vertex labels). If the
        boundary segments form closed loops, non-convex outlines and holes
        are respected; otherwise the convex hull is meshed.
      divisions: (m,) explicit sub-edge counts (defaults from lengths/h) —
        pass shared counts to make two meshes conform along a common line.
      clearance: background points closer than clearance*h to any constraint
        are dropped (keeps constraint sub-edges Delaunay).
      min_angle: optional quality floor in degrees — free background points
        are Lloyd-smoothed until every triangle clears it (the triangle
        library's "q" role); RuntimeError if unattainable.

    Returns a dict: vertices (N, 2), triangles (T, 3), vertex_markers (N, 1)
    in {0, 1}, vertex_labels (N, 1) carrying the originating segment marker,
    and h.
    """
    vertices = np.asarray(vertices, dtype=np.float64)
    segments = np.asarray(segments, dtype=np.int64)
    if segment_markers is None:
        segment_markers = np.ones(len(segments), dtype=np.int64)
    segment_markers = np.asarray(segment_markers, dtype=np.int64)

    seg_a = vertices[segments[:, 0]]
    seg_b = vertices[segments[:, 1]]
    if divisions is None:
        lengths = np.linalg.norm(seg_b - seg_a, axis=-1)
        divisions = segment_divisions(lengths, h)

    steiner, steiner_owner, chains = _sample_segments(vertices, segments, divisions)

    # background grid over the domain hull interior
    lo = vertices.min(axis=0)
    hi = vertices.max(axis=0)
    nx = max(1, int(np.ceil((hi[0] - lo[0]) / h)))
    ny = max(1, int(np.ceil((hi[1] - lo[1]) / h)))
    gx, gy = np.meshgrid(
        np.linspace(lo[0], hi[0], nx + 1), np.linspace(lo[1], hi[1], ny + 1)
    )
    grid = np.stack([gx.ravel(), gy.ravel()], axis=-1)

    hull = Delaunay(vertices)
    inside = hull.find_simplex(grid) >= 0
    grid = grid[inside]

    # non-convex / holed domains: further restrict to the closed boundary
    # loops (no-op for convex outlines — on-boundary ambiguity is covered
    # by the clearance band, which drops all near-constraint grid points)
    loops = _closed_boundary(vertices, segments, segment_markers)
    if loops is not None:
        grid = grid[_points_in_loops(grid, *loops)]

    n_fixed = len(vertices)
    n_steiner = len(steiner)

    # constraint sub-edges as vertex-index pairs (attempt-independent)
    chain_edges = []
    for a, idx, b in chains:
        chain = np.concatenate(([a], n_fixed + idx, [b]))
        chain_edges.append(np.stack([chain[:-1], chain[1:]], axis=-1))
    chain_edges = (
        np.concatenate(chain_edges, axis=0)
        if chain_edges
        else np.zeros((0, 2), dtype=np.int64)
    )
    chain_edges = np.sort(chain_edges, axis=1)

    grid_dist = _point_segment_distance(grid, seg_a, seg_b).min(axis=1)

    def conforming_delaunay(all_points):
        """Delaunay + constraint-sub-edge presence check.

        Encodes undirected edges as a*N+b (a<b) and set-compares in NumPy.
        """
        simplices = Delaunay(all_points).simplices
        n_pts = len(all_points)
        edges = np.sort(
            simplices[:, [0, 1, 1, 2, 0, 2]].reshape(-1, 2), axis=1
        ).astype(np.int64)
        tri_codes = edges[:, 0] * n_pts + edges[:, 1]
        want_codes = chain_edges[:, 0] * n_pts + chain_edges[:, 1]
        return simplices, bool(
            np.isin(want_codes, tri_codes, assume_unique=False).all()
        )

    for attempt in range(max_retries):
        clear = clearance * h * (1.0 + 0.5 * attempt)
        background = grid[grid_dist > clear]
        all_points = np.concatenate([vertices, steiner, background], axis=0)
        simplices, ok = conforming_delaunay(all_points)
        if ok:
            break
    else:
        raise RuntimeError(
            "PSLG triangulation failed to conform to constraint segments "
            f"after {max_retries} clearance expansions"
        )

    dropped_exterior = False

    def domain_filter(all_points, simplices):
        """Drop triangles outside the closed boundary loops (qhull meshes
        the convex hull; non-convex notches and holes get covered by
        triangles whose centroids lie outside the domain)."""
        nonlocal dropped_exterior
        if loops is None:
            return simplices
        centroids = all_points[simplices].mean(axis=1)
        keep = _points_in_loops(centroids, *loops)
        if not keep.all():
            dropped_exterior = True
        return simplices[keep]

    simplices = domain_filter(all_points, simplices)

    if min_angle is not None:
        from .quality import triangle_min_angles

        def floor_angle(points, tris):
            # ignore the collinear slivers destined for the drop below
            p = points[tris]
            cross = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
                p[:, 1, 1] - p[:, 0, 1]
            ) * (p[:, 2, 0] - p[:, 0, 0])
            real = np.abs(cross) > 1e-12 * h * h
            return float(triangle_min_angles(points, tris[real]).min())

        free = np.arange(n_fixed + n_steiner, len(all_points))
        for _ in range(30):
            if floor_angle(all_points, simplices) >= min_angle:
                break
            # Lloyd-style step: move each free background point to the
            # (incidence-weighted) mean of its triangulation neighbors
            nbr_sum = np.zeros_like(all_points)
            nbr_cnt = np.zeros(len(all_points))
            e = simplices[:, [0, 1, 1, 2, 2, 0]].reshape(-1, 2)
            np.add.at(nbr_sum, e[:, 0], all_points[e[:, 1]])
            np.add.at(nbr_cnt, e[:, 0], 1.0)
            np.add.at(nbr_sum, e[:, 1], all_points[e[:, 0]])
            np.add.at(nbr_cnt, e[:, 1], 1.0)
            new_pts = all_points.copy()
            new_pts[free] = nbr_sum[free] / np.maximum(nbr_cnt[free, None], 1.0)
            # smoothed points must stay out of the constraint clearance band
            d = _point_segment_distance(new_pts[free], seg_a, seg_b).min(axis=1)
            reverted = d <= clear
            new_pts[free[reverted]] = all_points[free[reverted]]
            new_simplices, ok = conforming_delaunay(new_pts)
            if not ok:
                break
            all_points = new_pts
            simplices = domain_filter(all_points, new_simplices)
        achieved = floor_angle(all_points, simplices)
        if achieved < min_angle:
            raise RuntimeError(
                f"min_angle={min_angle} deg not attained by smoothing "
                f"(achieved {achieved:.2f} deg); refine h or relax the floor"
            )

    # drop zero-area slivers qhull may emit on collinear boundary points
    p = all_points[simplices]
    cross = (p[:, 1, 0] - p[:, 0, 0]) * (p[:, 2, 1] - p[:, 0, 1]) - (
        p[:, 1, 1] - p[:, 0, 1]
    ) * (p[:, 2, 0] - p[:, 0, 0])
    good = np.abs(cross) > 1e-12 * h * h
    simplices = simplices[good]
    cross = cross[good]
    # enforce positive orientation
    flip = cross < 0
    simplices[flip] = simplices[flip][:, [0, 2, 1]]

    # vertex labels: max marker over incident constraint segments
    labels = np.zeros(len(all_points), dtype=np.int64)
    np.maximum.at(labels, segments[:, 0], segment_markers)
    np.maximum.at(labels, segments[:, 1], segment_markers)
    if n_steiner:
        labels[n_fixed : n_fixed + n_steiner] = segment_markers[steiner_owner]

    if dropped_exterior:
        # compact vertices orphaned by the exterior-triangle drop (only a
        # non-convex/holed domain can orphan; convex output is unchanged)
        used = np.zeros(len(all_points), dtype=bool)
        used[simplices.reshape(-1)] = True
        remap = -np.ones(len(all_points), dtype=np.int64)
        remap[used] = np.arange(int(used.sum()))
        all_points = all_points[used]
        labels = labels[used]
        simplices = remap[simplices]

    markers = (labels > 0).astype(np.int64)

    return {
        "vertices": all_points,
        "triangles": simplices.astype(np.int64),
        "vertex_markers": markers.reshape(-1, 1),
        "vertex_labels": labels.reshape(-1, 1),
        "h": h,
    }
