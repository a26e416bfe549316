"""Adaptive local mesh refinement: longest-edge (Rivara) bisection.

The reference can only refine globally, by re-triangulating at a smaller
area bound (``/root/reference/examples/example_weak_convergence.py:95-144``)
— its a-posteriori estimators (``examples/example_jump.py:75-94``) never
drive the mesh. This module closes that loop: bisect the longest edge of
every marked triangle, with a closure pass that keeps the mesh conforming
(an edge being split forces both adjacent triangles to split it).

Everything runs on host NumPy at mesh-build time (dynamic shapes), like
the rest of the mesh layer; the refined triangulation dict feeds straight
back into ``MeshTri``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["refine_adaptive", "dorfler_mark"]


def dorfler_mark(indicators, theta: float = 0.5) -> np.ndarray:
    """Dörfler (bulk-chasing) marking: smallest set holding theta of the
    total squared indicator. Returns a boolean (T,) mask."""
    eta2 = np.asarray(indicators, dtype=np.float64).reshape(-1) ** 2
    order = np.argsort(eta2)[::-1]
    csum = np.cumsum(eta2[order])
    count = int(np.searchsorted(csum, theta * csum[-1])) + 1
    marked = np.zeros(eta2.size, dtype=bool)
    marked[order[:count]] = True
    return marked


def refine_adaptive(triangulation: dict, marked) -> dict:
    """Bisect marked triangles (longest edge), closure keeps conformity.

    Args:
      triangulation: dict with ``vertices`` (N, 2), ``triangles`` (T, 3)
        and optional ``vertex_markers`` (N, 1) (1 = boundary).
      marked: (T,) boolean mask of triangles to refine.

    Returns a new triangulation dict of the same shape. Midpoint vertices
    of boundary edges (edges with a single adjacent triangle) are marked
    as boundary.
    """
    vertices = np.asarray(triangulation["vertices"], dtype=np.float64)
    triangles = np.asarray(triangulation["triangles"], dtype=np.int64)
    markers = np.asarray(
        triangulation.get(
            "vertex_markers", np.zeros((vertices.shape[0], 1), dtype=np.int64)
        )
    ).reshape(-1, 1)
    T = triangles.shape[0]
    marked = np.asarray(marked, dtype=bool).reshape(-1)
    if marked.shape[0] != T:
        raise ValueError(f"marked has {marked.shape[0]} entries for {T} cells")

    # unique edges and per-triangle edge ids in cycle order (01, 12, 20)
    local = triangles[:, [[0, 1], [1, 2], [2, 0]]]  # (T, 3, 2)
    flat = np.sort(local.reshape(-1, 2), axis=1)
    edges, inverse, counts = np.unique(
        flat, axis=0, return_inverse=True, return_counts=True
    )
    e_ids = inverse.reshape(T, 3)
    lens = np.linalg.norm(
        vertices[local[..., 0]] - vertices[local[..., 1]], axis=-1
    )
    longest_local = lens.argmax(axis=1)
    longest_edge = e_ids[np.arange(T), longest_local]

    # closure: a triangle touching any marked edge must (also) split its
    # longest edge; iterate to a fixpoint — monotone in the marked-edge
    # set, so it terminates in <= n_edges rounds
    edge_marked = np.zeros(edges.shape[0], dtype=bool)
    edge_marked[longest_edge[marked]] = True
    while True:
        touched = edge_marked[e_ids].any(axis=1)
        grow = touched & ~edge_marked[longest_edge]
        if not grow.any():
            break
        edge_marked[longest_edge[grow]] = True

    n_mid = int(edge_marked.sum())
    if n_mid == 0:
        return {
            "vertices": vertices,
            "triangles": triangles,
            "vertex_markers": markers,
        }
    mid_of_edge = np.full(edges.shape[0], -1, dtype=np.int64)
    mid_of_edge[edge_marked] = vertices.shape[0] + np.arange(n_mid)
    midpoints = vertices[edges[edge_marked]].mean(axis=1)
    mid_markers = (counts[edge_marked] == 1).astype(np.int64).reshape(-1, 1)

    # rotate every split triangle so its longest edge is (a, b), apex c —
    # rotations preserve orientation
    rot = np.stack(
        [longest_local, (longest_local + 1) % 3, (longest_local + 2) % 3],
        axis=1,
    )
    abc = np.take_along_axis(triangles, rot, axis=1)
    a, b, c = abc[:, 0], abc[:, 1], abc[:, 2]
    # edge ids in the rotated frame: ab (longest), bc, ca
    e_rot = np.take_along_axis(e_ids, rot, axis=1)
    m_ab = mid_of_edge[e_rot[:, 0]]
    bc_m = edge_marked[e_rot[:, 1]]
    ca_m = edge_marked[e_rot[:, 2]]
    m_bc = mid_of_edge[e_rot[:, 1]]
    m_ca = mid_of_edge[e_rot[:, 2]]

    split = edge_marked[longest_edge]
    out = [triangles[~split]]

    def tri(*cols):
        return np.stack(cols, axis=1)

    # first bisection: (a, m, c) and (m, b, c); each half bisects again if
    # its remaining original edge (ca / bc) is marked
    s = split
    left_plain = s & ~ca_m
    left_split = s & ca_m
    right_plain = s & ~bc_m
    right_split = s & bc_m
    out.append(tri(a[left_plain], m_ab[left_plain], c[left_plain]))
    out.append(tri(a[left_split], m_ab[left_split], m_ca[left_split]))
    out.append(tri(m_ab[left_split], c[left_split], m_ca[left_split]))
    out.append(tri(m_ab[right_plain], b[right_plain], c[right_plain]))
    out.append(tri(m_ab[right_split], b[right_split], m_bc[right_split]))
    out.append(tri(m_ab[right_split], m_bc[right_split], c[right_split]))

    return {
        "vertices": np.concatenate([vertices, midpoints], axis=0),
        "triangles": np.concatenate([t for t in out if t.size], axis=0),
        "vertex_markers": np.concatenate([markers, mid_markers], axis=0),
    }
