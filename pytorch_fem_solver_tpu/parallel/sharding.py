"""Multi-chip scaling: cell-sharded assembly + PCG over a device mesh.

The reference is strictly single-device (SURVEY.md §2: no torch.distributed
anywhere); its only scaling axis is mesh size. The TPU-native scaling design
shards the *cell* axis — element integration and the matrix-free operator are
embarrassingly parallel over cells — with one ``psum`` over the ICI ring per
matvec to combine partial DOF-vector contributions:

    x (replicated, n_dofs)  --gather-->  x_loc (sharded cells)
    y_loc = A_loc @ x_loc                (sharded tiny matmuls)
    y_partial = segment_sum(y_loc)       (per-device partial DOF vector)
    y = psum(y_partial, 'cells')         (ICI all-reduce -> replicated)

CG dot products act on replicated vectors, so the solve needs exactly one
collective per iteration. DOF vectors are replicated — the right trade for
DFN-scale systems (n_dofs << n_cells * n_quad memory traffic).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.6 moved shard_map out of experimental
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod.shard_map if hasattr(_shard_map_mod, "shard_map") else _shard_map_mod
except (ImportError, AttributeError):  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..ops.operators import local_matvec, operator_diagonal
from ..ops.solvers import pcg

CELL_AXIS = "cells"


def make_device_mesh(n_devices: Optional[int] = None, axis_name: str = CELL_AXIS):
    """1D device mesh over the first ``n_devices`` available devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def _pad_cells(local_matrices, dofs, n_shards: int):
    """Pad the cell axis to a multiple of the mesh size with zero matrices.

    Zero local matrices scatter nothing, so padding is exact (their DOF ids
    point at 0, which receives only zeros).
    """
    n_cells = local_matrices.shape[0]
    pad = (-n_cells) % n_shards
    if pad:
        local_matrices = jnp.concatenate(
            [local_matrices, jnp.zeros((pad,) + local_matrices.shape[1:],
                                       dtype=local_matrices.dtype)],
            axis=0,
        )
        dofs = jnp.concatenate(
            [dofs, jnp.zeros((pad,) + dofs.shape[1:], dtype=dofs.dtype)], axis=0
        )
    return local_matrices, dofs


def solve_pcg_sharded(
    basis,
    local_matrices,
    vector,
    device_mesh: Optional[Mesh] = None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    return_info: bool = False,
):
    """Matrix-free Jacobi-PCG with cells sharded over a device mesh.

    Drop-in equivalent of ``AbstractBasis.solve_iterative`` that distributes
    the operator over ``device_mesh`` (defaults to all devices). Exact same
    math — tests assert bit-comparable results vs the single-device path.
    """
    if device_mesh is None:
        device_mesh = make_device_mesh()
    axis = device_mesh.axis_names[0]
    n_shards = device_mesh.devices.size

    n_loc = basis._global_dofs4elements.shape[-1]
    dofs = basis._global_dofs4elements.reshape(-1, n_loc)
    local = local_matrices.reshape(-1, n_loc, n_loc)
    n = basis.n_dofs
    inner = basis._basis_parameters["inner_dofs"]

    local, dofs = _pad_cells(local, dofs, n_shards)

    diag = operator_diagonal(local, dofs, n)[inner]
    b_reduced = basis.reduce(vector)[..., 0]

    if maxiter is None:
        maxiter = max(10 * int(b_reduced.shape[-1]), 100)

    # jit on top of shard_map: eager shard_map dispatches per-op across
    # the mesh, ~10x the traced+compiled cost (see sharded_bsr)
    @jax.jit
    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    def run(local_chunk, dofs_chunk, b_full, diag_full):
        def matvec(x_reduced):
            x_full = jnp.zeros((n,), dtype=x_reduced.dtype).at[inner].set(
                x_reduced
            )
            y_partial = local_matvec(local_chunk, dofs_chunk, n, x_full)
            return jax.lax.psum(y_partial, axis)[inner]

        x, info = pcg(matvec, b_full, precond_diag=diag_full, tol=tol, maxiter=maxiter)
        return x, info.iterations, info.residual_norm, info.converged

    x, it, res, conv = run(local, dofs, b_reduced, diag)
    solution = basis.solution_tensor()
    u = solution.at[..., inner, 0].add(x)
    if return_info:
        from ..ops.solvers import PCGInfo

        return u, PCGInfo(it, res, conv)
    return u


def solve_pcg_sharded_ell(
    basis,
    local_matrices,
    vector,
    device_mesh: Optional[Mesh] = None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    max_k: int = 8,
    return_info: bool = False,
):
    """Jacobi-PCG with the hybrid-ELL operator row-sharded over the mesh.

    The TPU fast path's multi-chip variant: each device owns a block of
    reduced rows (ELL values + cols), the iterate is replicated, matvecs
    produce row-block partials combined with one tiled ``all_gather`` per
    iteration; the small COO spill tail is evaluated redundantly on every
    device (cheap, avoids a second collective).
    """
    import numpy as onp

    from ..ops.sparse import (
        ell_diagonal,
        ell_values_from_local,
        get_ell_structure,
    )

    if device_mesh is None:
        device_mesh = make_device_mesh()
    axis = device_mesh.axis_names[0]
    n_shards = device_mesh.devices.size

    structure = get_ell_structure(basis, max_k=max_k)

    values = ell_values_from_local(structure, local_matrices)
    ell, spill = values
    diag = ell_diagonal(structure, values)
    b_reduced = basis.reduce(vector)[..., 0]

    n = structure.n_inner
    pad = (-n) % n_shards
    n_pad = n + pad
    K = structure.cols.shape[1]

    ell_p = jnp.concatenate(
        [ell, jnp.zeros((pad, K), dtype=ell.dtype)], axis=0
    )
    cols_p = jnp.concatenate(
        [structure.cols, jnp.zeros((pad, K), dtype=structure.cols.dtype)], axis=0
    )
    diag_p = jnp.concatenate([diag, jnp.ones((pad,), dtype=diag.dtype)])
    b_p = jnp.concatenate([b_reduced, jnp.zeros((pad,), dtype=b_reduced.dtype)])

    if maxiter is None:
        maxiter = max(10 * n, 100)

    spill_rows = structure.spill_rows
    spill_cols = structure.spill_cols
    has_spill = bool(spill_rows.shape[0])
    rows_per_shard = n_pad // n_shards

    # jit on top of shard_map: eager shard_map dispatches per-op across
    # the mesh, ~10x the traced+compiled cost (see sharded_bsr)
    @jax.jit
    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(P(axis), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
        # the result is mathematically replicated (all_gather each matvec)
        # but the varying-axis tracker cannot prove it
        check_vma=False,
    )
    def run(ell_chunk, cols_chunk, b_full, diag_full, spill_vals):
        my_start = jax.lax.axis_index(axis) * rows_per_shard

        # matvec outputs are tagged varying over the mesh axis (they pass
        # through per-shard data before the all_gather), so the while_loop
        # carry must start varying too
        b_full = jax.lax.pcast(b_full, (axis,), to="varying")
        diag_full = jax.lax.pcast(diag_full, (axis,), to="varying")

        def matvec(x):
            y_local = (ell_chunk * x[cols_chunk]).sum(axis=-1)
            if has_spill:
                y_spill = jax.ops.segment_sum(
                    spill_vals * x[spill_cols],
                    spill_rows,
                    num_segments=n_pad,
                    indices_are_sorted=True,
                )
                y_local = y_local + jax.lax.dynamic_slice(
                    y_spill, (my_start,), (rows_per_shard,)
                )
            return jax.lax.all_gather(y_local, axis, tiled=True)

        x, info = pcg(matvec, b_full, precond_diag=diag_full, tol=tol, maxiter=maxiter)
        return x, info.iterations, info.residual_norm, info.converged

    x, it, res, conv = run(ell_p, cols_p, b_p, diag_p, spill)
    x = x[:n]
    solution = basis.solution_tensor()
    inner = basis._basis_parameters["inner_dofs"]
    u = solution.at[..., inner, 0].add(x)
    if return_info:
        from ..ops.solvers import PCGInfo

        return u, PCGInfo(it, res, conv)
    return u


def shard_basis_cells(basis, device_mesh: Optional[Mesh] = None):
    """Place a basis's per-cell quadrature arrays sharded over the mesh.

    Shards the cell axis of ``v_grad``, ``integration_points`` and ``_dx``
    (and their fracture-batched variants along the per-batch cell axis) so
    that jitted losses built on the basis compute integration locally per
    device, with XLA inserting the psum at the scatter-add. Returns a
    shallow copy; the original basis is untouched.

    Cell counts that don't divide the device count are *padded* (never
    silently left replicated): padded cells carry zero quadrature weight
    and scatter into DOF 0, so every integral and assembled vector is
    exact; geometry arrays repeat the last real cell so user closures see
    finite coordinates. Per-cell outputs of ``integrate_functional`` gain
    trailing zero rows for the padding — sums over cells are unchanged.
    """
    if device_mesh is None:
        device_mesh = make_device_mesh()
    axis = device_mesh.axis_names[0]
    n_shards = int(device_mesh.devices.size)

    n_cells = int(basis.integration_points.shape[-4])
    batched = basis.integration_points.ndim > 4
    pad = (-n_cells) % n_shards

    def cell_axis_of(x):
        # the CELL axis only (axis 0 flat, axis 1 behind a batch); anything
        # else (quadrature, batch) must stay replicated — sharding it would
        # force cross-device traffic into every per-cell op. The padded
        # count must match too: ``shard_leading`` sees arrays AFTER
        # ``pad_cells`` grew the cell axis to n_cells + pad.
        if batched and x.ndim >= 2 and x.shape[1] in (n_cells, n_cells + pad):
            return 1
        return 0

    def pad_cells(x, mode):
        ca = cell_axis_of(x)
        if x.shape[ca] != n_cells or pad == 0:
            return x
        if mode == "zero":
            shape = list(x.shape)
            shape[ca] = pad
            tail = jnp.zeros(shape, dtype=x.dtype)
        else:  # repeat the last real cell: finite geometry for closures
            tail = jnp.take(x, jnp.full((pad,), n_cells - 1), axis=ca)
        return jnp.concatenate([x, tail], axis=ca)

    def shard_leading(x):
        if not isinstance(x, jax.Array) or x.ndim == 0:
            return x
        ca = cell_axis_of(x)
        if x.shape[ca] != n_cells + pad:
            return x
        spec = [None] * x.ndim
        spec[ca] = axis
        return jax.device_put(x, NamedSharding(device_mesh, P(*spec)))

    import copy

    out = copy.copy(basis)
    out.v_grad = shard_leading(pad_cells(basis.v_grad, "edge"))
    out.integration_points = shard_leading(
        pad_cells(basis.integration_points, "edge")
    )
    out._dx = shard_leading(pad_cells(basis._dx, "zero"))
    if pad:
        # scatter targets for the padded cells: DOF 0, which receives only
        # zeros (local values carry _dx == 0); rebuild the scatter indices
        # to match the padded cell count
        dofs = basis._global_dofs4elements
        if batched and dofs.ndim == 2 and dofs.shape[0] != n_cells:
            # flat (B*T, n_loc) global-dof table of a batched basis (the
            # DFN glue): local values flatten as (B, T_pad, n_loc), so the
            # padding rows must be interleaved PER FRACTURE, not appended
            # once at the end — otherwise the scatter indices and the
            # flattened values disagree by (B-1)*pad rows
            n_batch = dofs.shape[0] // n_cells
            d3 = dofs.reshape(n_batch, n_cells, -1)
            zeros = jnp.zeros(
                (n_batch, pad, d3.shape[-1]), dtype=dofs.dtype
            )
            dofs_p = jnp.concatenate([d3, zeros], axis=1).reshape(
                n_batch * (n_cells + pad), -1
            )
        else:
            zshape = list(dofs.shape)
            zshape[-2] = pad
            dofs_p = jnp.concatenate(
                [dofs, jnp.zeros(zshape, dtype=dofs.dtype)], axis=-2
            )
        out._global_dofs4elements = dofs_p
        batch_size = dofs_p.shape[0] if dofs_p.ndim == 3 else None
        rebuilt = out._build_assembly_parameters(
            basis.n_dofs, dofs_p, basis._nodes4boundary_dofs, batch_size
        )
        out._basis_parameters = {**basis._basis_parameters, **rebuilt}
    return out
