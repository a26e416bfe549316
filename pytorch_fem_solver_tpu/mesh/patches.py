"""Vertex-centered criss-cross patches (batched local meshes).

Parity target: reference ``Patches`` (/root/reference/torch_fem/mesh/patches.py)
— B square patches, each split into 4 triangles around its center, used as
batched local test spaces for RVPINNs.

TPU-native construction: every patch shares the *same* template topology
(5 vertices, 4 cells, 8 edges), so topology is derived once from a unit
template and only geometry (coordinates, lengths) is broadcast over the
batch — O(1) host work regardless of B, where the reference stacks B
TensorDicts and loops Python over the batch for edge math.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import config
from .mesh_tri import MeshTri, _freeze, _mesh_flatten, _mesh_unflatten
from .meshes_tri import MeshesTri

#: corner sign pattern (counter-clockwise) plus center, reference patches.py:137-142
SIGNS_4_VERTICES = np.array(
    [[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [0.0, 0.0]]
)
#: the 4 triangles of a patch, reference patches.py:144-149
VERTICES_4_CELLS_4_PATCH = np.array(
    [[0, 1, 4], [1, 2, 4], [2, 3, 4], [3, 0, 4]], dtype=np.int64
)
#: corner DOFs are boundary, center is interior, reference patches.py:151-154
MARKERS_4_VERTICES = np.array([[1], [1], [1], [1], [0]], dtype=np.int64)


class Patches(MeshesTri):
    """B criss-cross square patches around given centers with given radii."""

    def __init__(self, centers, radius, *, _groups=None):
        if _groups is not None:
            self._t = _groups
            return

        centers = np.asarray(centers, dtype=np.float64).reshape(-1, 2)
        radius = np.asarray(radius, dtype=np.float64).reshape(-1, 1)
        if centers.shape[0] != radius.shape[0]:
            raise ValueError("centers and radius must have the same batch size")

        # template topology on the unit patch (center 0, radius 1)
        template = MeshTri._build_groups(
            self,
            {
                "vertices": SIGNS_4_VERTICES,
                "triangles": VERTICES_4_CELLS_4_PATCH,
                "vertex_markers": MARKERS_4_VERTICES,
            },
        )

        B = centers.shape[0]
        c = centers[:, None, :]  # (B, 1, 2)
        r = radius[:, None, :]  # (B, 1, 1)

        def tile(x):
            return np.broadcast_to(x, (B,) + x.shape).copy()

        t = template
        groups = {
            "vertices": {
                "coordinates": c + r * t["vertices"]["coordinates"],
                "markers": tile(t["vertices"]["markers"]),
            },
            "cells": {
                "vertices": tile(t["cells"]["vertices"]),
                "coordinates": c[:, None] + r[:, None] * t["cells"]["coordinates"],
                "length": radius[:, :, None, None, None]
                * t["cells"]["length"][None],
            },
            "edges": {
                "vertices": tile(t["edges"]["vertices"]),
                "markers": tile(t["edges"]["markers"]),
            },
            "interior_edges": {
                "vertices": tile(t["interior_edges"]["vertices"]),
                "cells": tile(t["interior_edges"]["cells"]),
                "coordinates": c[:, None]
                + r[:, None] * t["interior_edges"]["coordinates"],
                "length": radius[:, :, None, None]
                * t["interior_edges"]["length"][None],
                "normals": tile(t["interior_edges"]["normals"]),
            },
            "boundary_edges": {
                "vertices": tile(t["boundary_edges"]["vertices"]),
                "cells": tile(t["boundary_edges"]["cells"]),
                "coordinates": c[:, None]
                + r[:, None] * t["boundary_edges"]["coordinates"],
            },
        }
        # centers/radius live inside the pytree so jit/flatten round-trips
        # preserve them
        groups["patches"] = {"centers": centers, "radius": radius}
        self._t = _freeze(groups)

    @property
    def centers(self):
        return self._t["patches"]["centers"]

    @property
    def radius(self):
        return self._t["patches"]["radius"]

    # -- refinement (parity with reference patches.py:49-135) --------------

    @property
    def signs_4_vertices(self):
        return jnp.asarray(SIGNS_4_VERTICES, dtype=config.default_dtype())

    @property
    def vertices_4_cells_4_patch(self):
        return jnp.asarray(VERTICES_4_CELLS_4_PATCH, dtype=config.index_dtype())

    @property
    def markers_4_vertices(self):
        return jnp.asarray(MARKERS_4_VERTICES, dtype=config.index_dtype())

    def refine_patches(self, refine_idx, maintain_old_patches: bool = False):
        """Split marked patches into 4 axis-aligned children + 1 rotated patch.

        Returns (centers, radius, coordinates) of the refined patch set, from
        which a new ``Patches`` is constructed — same contract as the
        reference (patches.py:49-123). The rotated patch covers the center
        region so the child patches overlap-cover the parent.
        """
        refine_idx = np.asarray(refine_idx).reshape(-1).astype(bool)
        centers = np.asarray(self.centers)
        radius = np.asarray(self.radius)

        new_r = 0.5 * radius[refine_idx]  # (K, 1)
        corner_signs = SIGNS_4_VERTICES[:4]
        # child centers at the parent's quadrant midpoints
        new_centers = (
            centers[refine_idx][:, None, :] + corner_signs[None] * new_r[:, None]
        )  # (K, 4, 2)

        angle = math.pi / 4.0
        rot = np.array(
            [[math.cos(angle), -math.sin(angle)], [math.sin(angle), math.cos(angle)]]
        )
        rotated_radius = 2.0 * new_r / math.sqrt(2.0)
        rotated_centers = centers[refine_idx]

        if maintain_old_patches:
            keep_centers, keep_radius = centers, radius
        else:
            keep_centers, keep_radius = centers[~refine_idx], radius[~refine_idx]

        refined_centers = np.concatenate(
            [keep_centers, new_centers.reshape(-1, 2), rotated_centers], axis=0
        )
        refined_radius = np.concatenate(
            [keep_radius, np.repeat(new_r, 4, axis=0), rotated_radius], axis=0
        )

        # explicit vertex coordinates (children axis-aligned, last K rotated)
        child_coords = (
            new_centers.reshape(-1, 2)[:, None, :]
            + SIGNS_4_VERTICES[None] * np.repeat(new_r, 4, axis=0)[:, None]
        )
        rotated_signs = SIGNS_4_VERTICES @ rot.T
        rotated_coords = (
            rotated_centers[:, None, :]
            + rotated_signs[None] * rotated_radius[:, None]
        )
        keep_coords = (
            keep_centers[:, None, :] + SIGNS_4_VERTICES[None] * keep_radius[:, None]
        )
        refined_coords = np.concatenate(
            [keep_coords, child_coords, rotated_coords], axis=0
        )

        dtype = config.default_dtype()
        return (
            jnp.asarray(refined_centers, dtype=dtype),
            jnp.asarray(refined_radius, dtype=dtype),
            jnp.asarray(refined_coords, dtype=dtype),
        )

    def uniform_refine(self, nb_refinements: int = 1):
        """Refine every patch ``nb_refinements`` times (compounding).

        The reference's loop recomputes from the original patches each pass
        (patches.py:125-135, a known defect); here refinement compounds by
        rebuilding the patch set between passes.
        """
        patches = self
        for _ in range(nb_refinements):
            mask = np.ones(patches.batch_size()[0], dtype=bool)
            centers, radius, coords = patches.refine_patches(mask)
            patches = Patches(centers, radius)
        return patches.centers, patches.radius, patches["vertices", "coordinates"]


jax.tree_util.register_pytree_node(Patches, _mesh_flatten, _mesh_unflatten)
