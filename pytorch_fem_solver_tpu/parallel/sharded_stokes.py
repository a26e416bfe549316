"""Row-sharded Stokes solve: the multi-chip twin of
``ops.compiled.compiled_stokes_solver`` (schur method).

The whole nested Schur-complement CG runs inside ONE ``shard_map``-wrapped
program:

  A block       halo-cell local stiffness -> the per-shard BSR value
                scatter (``plan.slots_sh``) -> row-sharded inner PCG
                (``_shard_matvec``: one tiled ``all_gather`` per
                application; Jacobi or the per-shard aggregate-block
                two-level preconditioner)
  B^T p         mixed element blocks on the halo cells, scattered into the
                OWNED reduced velocity rows via ``plan.vec_slots_sh`` —
                exactly-once coverage, zero collectives, and the result is
                already in the layout the inner solve consumes
  B u           per-cell contributions masked by the disjoint
                ``plan.owned_cells_sh`` ownership (each real cell counted
                on exactly one shard) + one small ``psum`` of the (n_p,)
                partial per application
  outer CG      pressure vectors stay REPLICATED (n_p << n_u): the lumped
                mass preconditioner, mean projection and outer dots are
                identical deterministic computations per shard

Per outer iteration the collective budget is the inner PCG's own
all_gather/psum pairs plus one (n_p,) psum and one (n_pad,) all_gather —
the same asymptotics as the sharded linear solve.

Inner-solve economies match the compiled single-chip solver: warm-started
inner A-solves (optimally-scaled previous inner solution) and the van den
Eshof-Sleijpen relaxed inner tolerance under a flexible (Polak-Ribiere)
outer CG.

No reference counterpart: the reference has neither mixed elements nor
iterative or distributed solvers (dense LU only,
/root/reference/torch_fem/basis/abstract_basis.py:177-195; SURVEY.md §2).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.compiled import _CellChunkView, _mm_precision
from ..ops.saddle import StokesInfo, schur_flexible_cg
from ..ops.solvers import pcg
from .sharded_bsr import (
    _scatter_local_values,
    _shard_jacobi_precond,
    _shard_matvec,
    _shard_two_level_precond,
    get_bsr_shard_plan,
)
from .sharding import make_device_mesh, shard_map

__all__ = ["sharded_stokes_solver"]


def sharded_stokes_solver(
    velocity_basis,
    pressure_basis,
    a_form: Callable,
    b_form: Callable,
    *,
    device_mesh=None,
    tol: float = 1e-8,
    maxiter: Optional[int] = None,
    inner_tol: float = 1e-11,
    inner_maxiter: Optional[int] = None,
    precondition: str = "jacobi",
    mass_form: Optional[Callable] = None,
    max_b: Optional[int] = None,
    matmul_precision: Optional[str] = "highest",
    inner_eta: float = 0.1,
    inner_tol_max: float = 1e-2,
    f_solve_tol: Optional[float] = None,
    recovery_tol: Optional[float] = None,
    inner_iters: Optional[int] = None,
):
    """Build a jitted sharded ``solve(f, g=None, x0=None) -> (u, p,
    StokesInfo)`` for the Stokes saddle system.

    Same forms contract, stopping rule (lumped-M_p-preconditioned Schur
    residual) and return convention as
    :func:`ops.compiled.compiled_stokes_solver` with ``method="schur"``;
    outer-iteration/solution parity vs the single-device path is asserted
    in ``tests/test_sharding.py``. ``precondition`` is ``"jacobi"``
    (robust default) or ``"two_level"``/``"auto"`` (per-shard
    aggregate-block smoother + constants coarse space — algebraic, so it
    applies to the vector A block too, but without the single-chip path's
    rigid-body-mode coarse it needs more inner iterations there).
    """
    if device_mesh is None:
        device_mesh = make_device_mesh()
    if precondition not in ("auto", "two_level", "jacobi"):
        raise ValueError(f"unknown precondition: {precondition!r}")
    Vu, Vp = velocity_basis, pressure_basis
    if mass_form is None:
        mass_form = lambda b_: b_.v @ jnp.matrix_transpose(b_.v)

    axis = device_mesh.axis_names[0]
    n_shards = int(device_mesh.devices.size)
    plan = get_bsr_shard_plan(Vu, n_shards, max_b=max_b)
    st = plan.st
    k = st.block
    lrows = plan.rps * k
    n_u, n_p = int(Vu.n_dofs), int(Vp.n_dofs)
    n_loc_u = int(Vu._global_dofs4elements.shape[-1])
    n_loc_p = int(Vp._global_dofs4elements.shape[-1])
    if inner_maxiter is None:
        inner_maxiter = max(10 * plan.nb_pad * k, 100)
    outer_cap = maxiter if maxiter is not None else 10 * n_p

    # ---- host-gathered per-shard halo cell data --------------------------
    cells = np.asarray(plan.cells_sh.reshape(-1))
    vgrad_sh = jnp.asarray(np.asarray(Vu.v_grad)[cells])
    dx_sh = jnp.asarray(np.asarray(Vu._dx)[cells])
    pts_sh = jnp.asarray(np.asarray(Vu.integration_points)[cells])
    u_dofs_sh = jnp.asarray(
        np.asarray(Vu._global_dofs4elements).reshape(-1, n_loc_u)[cells]
    )
    p_dofs_sh = jnp.asarray(
        np.asarray(Vp._global_dofs4elements).reshape(-1, n_loc_p)[cells]
    )
    # mixed coupling block: geometry-only, assembled once on the host-
    # committed arrays and gathered per halo cell
    local_b_host = np.asarray(
        Vp.integrate_mixed_bilinear_form_local(Vu, b_form)
    )
    local_b_sh = jnp.asarray(local_b_host.reshape(-1, n_loc_p, n_loc_u)[cells])
    mp_lumped = Vp._assemble_linear_from_local(
        Vp.integrate_bilinear_form_local(mass_form).sum(-1, keepdims=True)
    )[:, 0]

    v_all = Vu.v
    element = Vu._element
    evaluate = Vu._evaluate_form
    inner_perm = jnp.asarray(st.inner_perm)
    n_inner = st.n_inner

    @partial(
        shard_map,
        mesh=device_mesh,
        in_specs=(
            P(axis),  # local_a
            P(axis), P(axis), P(axis),  # local_b, u_dofs, p_dofs
            P(axis), P(axis), P(axis),  # slots, vec_slots, owned
            P(axis), P(axis), P(axis), P(axis),  # bcols, bcols2, hrows, agg
            P(), P(), P(), P(), P(),  # iperm, mp, f, g, x0
        ),
        out_specs=(P(), P(), P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def run(local_a, local_b_s, u_dofs_s, p_dofs_s, slots_s, vslots_s,
            owned_s, bcols_s, bcols2_s, hrows_s, agg_s, iperm, mp, f, g,
            x0):
        dtype = f.dtype
        v1, v2, diag_local = _scatter_local_values(plan, local_a, slots_s)
        matvec = _shard_matvec(plan, axis, v1, v2, bcols_s, bcols2_s, hrows_s)
        pdot = lambda a, b: jax.lax.psum(jnp.sum(a * b), axis)
        if precondition in ("auto", "two_level"):
            precond = _shard_two_level_precond(
                plan, axis, v1, v2, agg_s, bcols_s, bcols2_s, hrows_s
            )
        else:
            precond = _shard_jacobi_precond(diag_local)

        mp_total = mp.sum()
        inv_lump = 1.0 / mp

        def expand(x_local):
            """local reduced rows -> full (n_u,) velocity vector (zeros at
            Dirichlet rows): one tiled all_gather + permutation scatter."""
            x_full = jax.lax.all_gather(x_local, axis, tiled=True)
            return (
                jnp.zeros((n_u,), dtype=dtype).at[iperm].set(x_full[:n_inner])
            )

        def reduce_rows(v_full):
            """full (n_u,) -> this shard's reduced rows (the bsr_reduce
            twin: gather the owned slice of the permuted inner rows)."""
            my = jax.lax.axis_index(axis)
            inner_vals = v_full[iperm]
            padded = jnp.pad(inner_vals, (0, plan.nb_pad * k - n_inner))
            return jax.lax.dynamic_slice(padded, (my * lrows,), (lrows,))

        def apply_b(u_full):
            """B u, replicated (n_p,): owned-cell partial sums + one psum."""
            u_cells = u_full[u_dofs_s]
            pb = jnp.einsum(
                "tpi,ti->tp", local_b_s, u_cells,
                preferred_element_type=dtype,
            )
            pb = jnp.where(owned_s[:, None], pb, 0.0)
            partial_p = (
                jnp.zeros((n_p,), dtype=dtype)
                .at[p_dofs_s.reshape(-1)]
                .add(pb.reshape(-1))
            )
            return jax.lax.psum(partial_p, axis)

        def apply_bt_local(p_full):
            """B^T p in this shard's reduced rows (exactly-once via the
            vec_slots scatter, zero collectives)."""
            p_cells = p_full[p_dofs_s]
            ub = jnp.einsum(
                "tpi,tp->ti", local_b_s, p_cells,
                preferred_element_type=dtype,
            )
            return (
                jnp.zeros((lrows,), dtype=dtype)
                .at[vslots_s]
                .add(ub.reshape(-1), mode="drop")
            )

        def project_mean(p_vec):
            return p_vec - (mp * p_vec).sum() / mp_total

        precond_p = lambda r: project_mean(inv_lump * r)

        def solve_a_local(rhs_local, x0_local, tol_inner):
            return pcg(
                matvec,
                rhs_local,
                x0=x0_local,
                precond=precond,
                tol=tol_inner,
                maxiter=inner_maxiter,
                dot=pdot,
            )

        if inner_iters is None:
            solve_a_schur = solve_a_local
        else:
            # fixed-iteration inexact applies (see compiled_stokes_solver's
            # inner_iters docs): tol=0 runs exactly inner_iters steps
            def solve_a_schur(rhs_local, x0_local, tol_inner):
                return pcg(
                    matvec,
                    rhs_local,
                    x0=x0_local,
                    precond=precond,
                    tol=0.0,
                    maxiter=inner_iters,
                    dot=pdot,
                )

        zeros_local = jnp.zeros((lrows,), dtype=dtype)
        u_f_local, info_f = solve_a_local(
            reduce_rows(f), zeros_local,
            f_solve_tol if f_solve_tol is not None else inner_tol,
        )
        rhs_p = project_mean(apply_b(expand(u_f_local)) - g)

        # shared flexible-CG Schur outer loop (ops/saddle.py): only the
        # layout hooks differ from the single-chip compiled solver
        p_flat, res_fin, k_out, atol, inner_schur, u_bt = schur_flexible_cg(
            rhs_p,
            x0,
            apply_bt_w=apply_bt_local,
            solve_a=solve_a_schur,
            schur_out=lambda y: project_mean(apply_b(expand(y))),
            precond_p=precond_p,
            dot_w=pdot,
            zeros_red=zeros_local,
            tol=tol,
            inner_tol=inner_tol,
            inner_eta=inner_eta,
            inner_tol_max=inner_tol_max,
            outer_cap=outer_cap,
        )
        p_out = project_mean(p_flat)
        # velocity recovery warm-started from the outer CG's free velocity
        # by-product (see schur_flexible_cg)
        u_local, info_u = solve_a_local(
            reduce_rows(f) - apply_bt_local(p_out),
            u_f_local - u_bt,
            recovery_tol if recovery_tol is not None else inner_tol,
        )
        u_full = expand(u_local)
        inner_total = info_f.iterations + inner_schur + info_u.iterations
        return (u_full, p_out, k_out, res_fin, res_fin <= atol,
                info_u.iterations, info_u.residual_norm, info_u.converged,
                inner_total)

    @jax.jit
    def _solve(vg, dx, pts, f, g, x0):
        view = _CellChunkView(v_all, vg, pts, dx, element)
        local_a = (evaluate(a_form, view) * dx).sum(-3)
        (u_full, p_out, k_out, res_fin, conv, it_u, res_u, conv_u,
         inner_total) = run(
            local_a, local_b_sh, u_dofs_sh, p_dofs_sh,
            plan.slots_sh, plan.vec_slots_sh, plan.owned_cells_sh,
            plan.bcols_sh, plan.bcols2_sh, plan.hrows_sh, plan.agg_sh,
            inner_perm, jnp.asarray(mp_lumped), f[:, 0], g[:, 0], x0,
        )
        from ..ops.solvers import PCGInfo

        info = StokesInfo(
            outer_iterations=k_out,
            schur_residual=res_fin,
            converged=conv,
            inner_info=PCGInfo(it_u, res_u, conv_u),
            inner_total=inner_total,
        )
        return u_full[:, None], p_out[:, None], info

    f_dtype = Vu._coords4global_dofs.dtype
    zero_g = jnp.zeros((n_p, 1), dtype=f_dtype)
    zero_x0 = jnp.zeros((n_p,), dtype=f_dtype)

    def solve(f, g=None, x0=None):
        with _mm_precision(matmul_precision):
            return _solve(
                vgrad_sh, dx_sh, pts_sh, f,
                zero_g if g is None else g,
                zero_x0 if x0 is None else x0[:, 0],
            )

    return solve
