"""Row-sharded generalized eigensolve: the multi-chip twin of
``ops.compiled.compiled_eigsh_solver`` (LOBPCG method).

LOBPCG is the natural multi-chip eigensolver: every round is one A-block
matvec, one M-block matvec and one preconditioner application — all
row-sharded with one tiled ``all_gather`` each — plus a handful of small
(<= 3m x 3m) Gram matrices, which are per-shard partial products reduced
with ``psum`` (the ``psum`` hook on :func:`ops.eigen.lobpcg_eigsh`); the
small eigendecompositions are computed redundantly on every shard (3m x 3m,
trivial). Both forms assemble per shard from the same halo-cell partition
as the sharded linear path (zero collectives in assembly).

No reference counterpart: the reference has neither an eigensolver nor any
distributed path (SURVEY.md §2).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.compiled import _CellChunkView, _mm_precision
from ..ops.eigen import lobpcg_eigsh
from .sharded_bsr import (
    _scatter_local_values,
    _shard_jacobi_precond,
    _shard_matvec,
    _shard_two_level_precond,
    get_bsr_shard_plan,
)
from .sharding import make_device_mesh, shard_map

__all__ = ["sharded_eigsh_solver"]


def sharded_eigsh_solver(
    basis,
    a_form: Callable,
    m_form: Callable,
    k: int = 6,
    *,
    device_mesh=None,
    tol: float = 1e-9,
    max_rounds: int = 200,
    precondition: str = "two_level",
    seed: int = 0,
    max_b: Optional[int] = None,
    lock_tol: Optional[float] = None,
    matmul_precision: Optional[str] = "highest",
):
    """Build a jitted sharded ``solve() -> (vals (k,), vecs (n_dofs, k),
    (rounds, eig_change, converged))`` for the smallest ``k`` pairs of the
    SPD pencil (A, M) on the interior DOFs.

    Same contract and stopping rule as
    :func:`ops.compiled.compiled_eigsh_solver` with ``method="lobpcg"``
    (the compiled default); round/value parity vs the single-device path is
    asserted in ``tests/test_sharding.py``. ``precondition`` is
    ``"two_level"``/``"auto"`` (per-shard aggregate-block + sharded coarse
    apply, scalar bases) or ``"jacobi"``.
    """
    if device_mesh is None:
        device_mesh = make_device_mesh()
    if precondition not in ("auto", "two_level", "jacobi"):
        raise ValueError(f"unknown precondition: {precondition!r}")
    axis = device_mesh.axis_names[0]
    n_shards = int(device_mesh.devices.size)
    plan = get_bsr_shard_plan(basis, n_shards, max_b=max_b)
    st = plan.st
    kb = st.block
    lrows = plan.rps * kb
    n_dofs = int(basis.n_dofs)
    n_inner = st.n_inner
    if k > n_inner:
        raise ValueError(f"requested k={k} eigenpairs from an n={n_inner} system")
    m_block = min(k + max(2, k // 2), n_inner)

    # per-shard halo cell data (same partition as the sharded linear path)
    cells = plan.cells_sh.reshape(-1)
    vgrad_sh = jnp.asarray(np.asarray(basis.v_grad)[cells])
    dx_sh = jnp.asarray(np.asarray(basis._dx)[cells])
    pts_sh = jnp.asarray(np.asarray(basis.integration_points)[cells])
    v_all = basis.v
    element = basis._element
    evaluate = basis._evaluate_form
    inner_perm = jnp.asarray(st.inner_perm)

    # starting block: random on interior DOFs in the padded reduced layout
    # (zero on padding rows), rows sharded. Drawn EXACTLY like the
    # single-device path (full-DOF normal block permuted by inner_perm) so
    # the same seed gives bitwise-identical starting blocks — the parity
    # tests compare round counts.
    rng = np.random.default_rng(seed)
    dtype = np.asarray(basis._coords4global_dofs).dtype
    rand = rng.standard_normal((n_dofs, m_block))
    x0_host = np.zeros((plan.nb_pad * kb, m_block), dtype=dtype)
    x0_host[:n_inner] = rand[np.asarray(st.inner_perm)]
    x0 = jnp.asarray(x0_host)

    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(
            P(axis), P(axis),  # local_a, local_m
            P(axis), P(axis), P(axis), P(axis), P(axis),  # tables
            P(axis),  # x0 rows
        ),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def run(local_a, local_m, slots_s, bcols_s, bcols2_s, hrows_s, agg_s,
            x0_local):
        v1a, v2a, diag_a = _scatter_local_values(plan, local_a, slots_s)
        v1m, v2m, _ = _scatter_local_values(plan, local_m, slots_s)
        a_mv = _shard_matvec(plan, axis, v1a, v2a, bcols_s, bcols2_s, hrows_s)
        m_mv = _shard_matvec(plan, axis, v1m, v2m, bcols_s, bcols2_s, hrows_s)
        if precondition in ("auto", "two_level"):
            precond = _shard_two_level_precond(
                plan, axis, v1a, v2a, agg_s, bcols_s, bcols2_s, hrows_s
            )
        else:
            precond = _shard_jacobi_precond(diag_a)
        vals, vecs_local, (rounds, change, conv) = lobpcg_eigsh(
            a_mv,
            m_mv,
            x0_local,
            k,
            tol=tol,
            # same LOBPCG floor as compiled_eigsh_solver (ops/compiled.py):
            # an explicit small max_rounds must mean the same thing on both
            max_rounds=max(max_rounds, 200),
            precond=precond,
            lock_tol=lock_tol,
            psum=lambda x: jax.lax.psum(x, axis),
        )
        vecs_full = jax.lax.all_gather(vecs_local, axis, tiled=True)
        return vals, vecs_full, rounds, change, conv

    @jax.jit
    def _solve(vg, dx, pts, x0_):
        view = _CellChunkView(v_all, vg, pts, dx, element)
        local_a = (evaluate(a_form, view) * dx).sum(-3)
        local_m = (evaluate(m_form, view) * dx).sum(-3)
        vals, vecs_pad, rounds, change, conv = run(
            local_a, local_m,
            plan.slots_sh, plan.bcols_sh, plan.bcols2_sh,
            plan.hrows_sh, plan.agg_sh, x0_,
        )
        vecs = (
            jnp.zeros((n_dofs, k), dtype=vecs_pad.dtype)
            .at[inner_perm]
            .set(vecs_pad[:n_inner])
        )
        return vals, vecs, (rounds, change, conv)

    def solve():
        with _mm_precision(matmul_precision):
            return _solve(vgrad_sh, dx_sh, pts_sh, x0)

    return solve
