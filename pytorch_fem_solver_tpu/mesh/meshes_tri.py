"""Batch of B triangular meshes with identical topology sizes.

TPU-native replacement for the reference ``MeshesTri``
(/root/reference/torch_fem/mesh/meshes_tri.py). Where the reference loops
Python over the batch for edge computations (meshes_tri.py:79-151), this
implementation builds each mesh's topology on the host once and *stacks* the
derived arrays, so every downstream compute path is a single vectorized
operation over a leading batch axis — vmap/shard_map-friendly by
construction.

Constraint (same as the reference's ``tensordict.stack``): all meshes in the
batch must have equal vertex/cell/edge counts.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh_tri import MeshTri, _freeze


class MeshesTri(MeshTri):
    """B stacked triangle meshes; every array gains a leading batch axis."""

    def __init__(self, triangulations: Sequence[dict[str, Any]] | None = None, *, _groups=None):
        if _groups is not None:
            self._t = _groups
            return
        if not triangulations:
            raise ValueError("MeshesTri requires a non-empty list of triangulations")

        groups = [
            MeshTri._build_groups(self, t) for t in map(dict, triangulations)
        ]
        stacked = jax.tree_util.tree_map(
            lambda *leaves: np.stack(leaves, axis=0), *groups
        )
        self._t = _freeze(stacked)

    def batch_size(self):
        return (int(self["vertices", "coordinates"].shape[0]),)

    @property
    def n_meshes(self) -> int:
        return self.batch_size()[0]

    @staticmethod
    def compute_coordinates_4_cells(coordinates_4_vertices, vertices_4_cells):
        """Batched gather: out[b, c, i] = coords[b, cells[b, c, i]].

        Replaces the reference's arange-indexing (meshes_tri.py:33-41) with
        ``take_along_axis`` semantics via vmap, which XLA lowers to a single
        gather.
        """
        return jax.vmap(lambda coords, cells: coords[cells])(
            coordinates_4_vertices, vertices_4_cells
        )

    @staticmethod
    def apply_mask(tensor, mask):
        """Reference-parity helper (meshes_tri.py:43-52).

        The reference concatenates per-batch boolean masks in a Python loop,
        which only works because every batch entry selects the same count.
        Here the same contract is expressed as a static batched gather when
        the mask is integer indices, or a vmapped boolean compress otherwise.

        HOST-ONLY for boolean masks: the selected count is data-dependent
        (``int(counts)`` below), so the boolean branch cannot run under jit
        tracing — call it at construction time, like the reference does.
        The integer-index branch is trace-safe.
        """
        if isinstance(mask, (list, tuple)):
            mask = mask[0]
        mask = jnp.asarray(mask)
        if mask.dtype == jnp.bool_:
            if isinstance(jnp.sum(mask[0]), jax.core.Tracer):
                raise TypeError(
                    "MeshesTri.apply_mask with a boolean mask is host-only: "
                    "the output size is data-dependent. Precompute integer "
                    "indices (jnp.nonzero on host) to use it under jit."
                )
            counts = jnp.sum(mask[0])
            idx = jnp.argsort(~mask, axis=-1, stable=True)[..., : int(counts)]
            return jax.vmap(lambda t, i: t[i])(tensor, idx)
        return jax.vmap(lambda t, i: t[i])(tensor, mask)


from .mesh_tri import _mesh_flatten, _mesh_unflatten  # noqa: E402

jax.tree_util.register_pytree_node(MeshesTri, _mesh_flatten, _mesh_unflatten)
