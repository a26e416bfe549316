"""Row-sharded Newton solve: the multi-chip twin of
``ops.compiled.compiled_newton_solver``.

The whole Newton iteration runs inside ONE ``shard_map``-wrapped
``lax.while_loop``:

  residual        each device evaluates the residual form on its halo cells
                  and scatter-adds the entries whose reduced row it owns
                  (``plan.vec_slots_sh`` — exactly-once coverage, zero
                  collectives; the norm is one scalar ``psum``)
  Jacobian        per-cell ``jax.jvp`` columns on the same halo cells ->
                  the existing per-shard BSR value scatter
                  (``plan.slots_sh``), identical to the linear path
  update solve    row-sharded BiCGStab on the local operator
                  (``_shard_matvec``: one tiled ``all_gather`` of the
                  search direction per application) with Jacobi or the
                  per-shard aggregate-block two-level preconditioner
  line search     backtracking damping on the psum'd reduced residual norm
                  (same NaN-rejecting policy as the compiled single-chip
                  solver)

The iterate ``u`` stays replicated (it is O(n), same footprint as the
all_gathered search direction the matvec already materializes); everything
O(nnz) — values, smoother blocks, coarse rows — is per-shard.

No reference counterpart: the reference has neither a nonlinear solver nor
any distributed path (dense LU only,
/root/reference/torch_fem/basis/abstract_basis.py:177-195; SURVEY.md §2).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..basis.abstract_basis import AbstractBasis
from ..ops.compiled import _CellChunkView, _mm_precision
from ..ops.solvers import bicgstab
from .sharded_bsr import (
    _scatter_local_values,
    _shard_jacobi_precond,
    _shard_matvec,
    _shard_two_level_precond,
    get_bsr_shard_plan,
)
from .sharding import make_device_mesh, shard_map

__all__ = ["sharded_newton_solver"]


class _HaloCellView(_CellChunkView):
    """Halo-cell slice of a basis for residual evaluation: the chunk view
    plus the quadrature-iterate hook the Newton machinery differentiates
    through (shared with AbstractBasis — it only reads ``v``/``v_grad``)."""

    def __init__(self, v, v_grad, integration_points, dx, element,
                 n_components=1):
        super().__init__(v, v_grad, integration_points, dx, element)
        # bypass _CellChunkView.__getattr__ for the attributes
        # _iterate_at_quadrature actually reads
        object.__setattr__(self, "n_components", n_components)


_HaloCellView._iterate_at_quadrature = AbstractBasis._iterate_at_quadrature
_HaloCellView._evaluate_form = staticmethod(
    AbstractBasis.__dict__["_evaluate_form"].__func__
)


def sharded_newton_solver(
    basis,
    residual_form: Callable,
    *,
    device_mesh=None,
    tol: float = 1e-10,
    max_newton: int = 25,
    solve_tol: float = 1e-8,
    solve_maxiter: Optional[int] = None,
    precondition: str = "jacobi",
    damping: bool = True,
    max_b: Optional[int] = None,
    matmul_precision: Optional[str] = "highest",
):
    """Build a jitted sharded ``solve(u0=None) -> (u, (iterations,
    residual_norm, converged))`` for F(u)[v] = 0.

    Same ``residual_form(basis, u, u_grad)`` contract, stopping rule
    (relative reduced-residual norm), damping policy and return convention
    as :func:`ops.compiled.compiled_newton_solver`; iteration/solution
    parity vs the single-device path is asserted in
    ``tests/test_sharding.py``. ``precondition`` is ``"jacobi"`` (robust
    default for the non-symmetric linearization) or ``"auto"``/
    ``"two_level"`` (per-shard aggregate-block two-level rebuilt from each
    step's Jacobian values — scalar bases only, like the sharded linear
    path). Extra ``residual_form`` arguments are not supported on the
    sharded path (they would need halo gathering); close over arrays
    instead.
    """
    if device_mesh is None:
        device_mesh = make_device_mesh()
    if precondition not in ("auto", "two_level", "jacobi"):
        raise ValueError(f"unknown precondition: {precondition!r}")
    axis = device_mesh.axis_names[0]
    n_shards = int(device_mesh.devices.size)
    plan = get_bsr_shard_plan(basis, n_shards, max_b=max_b)
    st = plan.st
    k = st.block
    lrows = plan.rps * k
    n_dofs = int(basis.n_dofs)
    n_loc = int(basis._global_dofs4elements.shape[-1])
    n_comp = int(getattr(basis, "n_components", 1))
    if solve_maxiter is None:
        solve_maxiter = max(10 * plan.nb_pad * k, 100)

    # per-shard halo cell data (host-gathered once; per-device memory is
    # T_max ~ T/n_shards + halo, not T)
    cells = plan.cells_sh.reshape(-1)
    vgrad_sh = jnp.asarray(np.asarray(basis.v_grad)[cells])
    dx_sh = jnp.asarray(np.asarray(basis._dx)[cells])
    pts_sh = jnp.asarray(np.asarray(basis.integration_points)[cells])
    dofs_sh = jnp.asarray(
        np.asarray(basis._global_dofs4elements).reshape(-1, n_loc)[cells]
    )
    v_all = basis.v
    element = basis._element
    inner_perm = jnp.asarray(st.inner_perm)
    n_inner = st.n_inner

    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(
            P(axis), P(axis), P(axis), P(axis),  # vg, dx, pts, dofs
            P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),  # tables
            P(),  # inner_perm (replicated)
            P(),  # u0 (replicated)
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def run(vg, dx, pts, dofs_s, slots_s, vslots_s, bcols_s, bcols2_s,
            hrows_s, agg_s, iperm, u0):
        view = _HaloCellView(v_all, vg, pts, dx, element, n_comp)
        pdot = lambda u, v: jax.lax.psum(jnp.sum(u * v), axis)

        def residual_local(u_cells):
            uh, ugh = view._iterate_at_quadrature(u_cells)
            integrand = view._evaluate_form(residual_form, view, uh, ugh)
            return (integrand * dx).sum(-3)

        def reduced_residual(u_full):
            """Owned-rows slice of the reduced residual: halo-cell local
            vectors scattered at vec_slots (foreign/Dirichlet/pad rows
            dropped — every real entry lands on exactly one shard)."""
            u_cells = u_full[dofs_s]
            rl = residual_local(u_cells)
            return (
                jnp.zeros((lrows,), dtype=u_full.dtype)
                .at[vslots_s]
                .add(rl.reshape(-1), mode="drop")
            )

        def res_norm(u_full):
            r = reduced_residual(u_full)
            return jnp.sqrt(pdot(r, r)), r

        res0, _ = res_norm(u0)
        target = tol * jnp.maximum(1.0, res0)

        def cond(state):
            _, res, kn = state
            return jnp.logical_and(res > target, kn < max_newton)

        def body(state):
            u, res, kn = state
            u_cells = u[dofs_s]
            r_local = (
                jnp.zeros((lrows,), dtype=u.dtype)
                .at[vslots_s]
                .add(residual_local(u_cells).reshape(-1), mode="drop")
            )
            # consistent Jacobian: one jvp per local DOF on halo cells
            cols = []
            for j in range(n_loc):
                tangent = jnp.zeros_like(u_cells).at[..., j].set(1.0)
                _, col = jax.jvp(residual_local, (u_cells,), (tangent,))
                cols.append(col)
            j_local = jnp.concatenate(cols, axis=-1)
            v1, v2, diag_local = _scatter_local_values(plan, j_local, slots_s)
            matvec = _shard_matvec(
                plan, axis, v1, v2, bcols_s, bcols2_s, hrows_s
            )
            if precondition in ("auto", "two_level"):
                precond = _shard_two_level_precond(
                    plan, axis, v1, v2, agg_s, bcols_s, bcols2_s, hrows_s
                )
            else:
                precond = _shard_jacobi_precond(diag_local)
            x, _ = bicgstab(
                matvec,
                -r_local,
                precond=precond,
                tol=solve_tol,
                maxiter=solve_maxiter,
                dot=pdot,
            )
            x_full = jax.lax.all_gather(x, axis, tiled=True)
            delta = (
                jnp.zeros((n_dofs,), dtype=u.dtype)
                .at[iperm]
                .set(x_full[:n_inner])
            )

            def try_norm(s):
                rn, _ = res_norm(u + s * delta)
                return rn

            rn1 = try_norm(1.0)
            if damping:

                def damp_cond(c):
                    _, rn, t = c
                    # NOT (rn < res): a NaN trial norm must keep damping,
                    # not be accepted (same policy as the compiled solver)
                    return jnp.logical_and(
                        jnp.logical_not(rn < res), t < 12
                    )

                def damp_body(c):
                    s, _, t = c
                    s2 = 0.5 * s
                    return (s2, try_norm(s2), t + 1)

                s, rn, _ = jax.lax.while_loop(
                    damp_cond, damp_body, (1.0, rn1, 0)
                )
            else:
                s, rn = 1.0, rn1
            bad = jnp.logical_not(jnp.isfinite(rn))
            if damping:
                bad = jnp.logical_or(bad, rn >= res)
            u_next = jnp.where(bad, u, u + s * delta)
            rn = jnp.where(bad, res, rn)
            k_next = jnp.where(bad, max_newton, kn + 1)
            return (u_next, rn, k_next)

        u, res, kn = jax.lax.while_loop(cond, body, (u0, res0, 0))
        return u, kn, res, res <= target

    @jax.jit
    def _solve(u0):
        u, kn, res, conv = run(
            vgrad_sh, dx_sh, pts_sh, dofs_sh,
            plan.slots_sh, plan.vec_slots_sh, plan.bcols_sh,
            plan.bcols2_sh, plan.hrows_sh, plan.agg_sh,
            inner_perm, u0,
        )
        return u[:, None], (kn, res, conv)

    def solve(u0=None):
        if u0 is None:
            u0 = basis.solution_tensor()
        with _mm_precision(matmul_precision):
            return _solve(u0[..., 0])

    return solve
