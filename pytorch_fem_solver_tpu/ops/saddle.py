"""Matrix-free saddle-point (Stokes-type) solver: Schur-complement CG.

The mixed examples solve the Taylor-Hood system dense (LU with one pinned
pressure DOF, ``examples/example_stokes.py``) — fine for parity, O(n^2)
memory at scale. This module solves

    [A  B^T] [u]   [f]
    [B   0 ] [p] = [g]

without materializing any global matrix: A (the viscous block, SPD on the
Dirichlet-reduced velocity space) acts through the hybrid-BSR PCG of
``solve_iterative``; B / B^T act through the UNASSEMBLED two-space element
matrices (gather trial DOFs -> local matvec -> scatter to test DOFs, the
same pattern as the matrix-free operators in ``ops.operators``). The
pressure solve is conjugate gradients on the Schur complement
S = B A^{-1} B^T — each application costs one inner A-solve —
preconditioned by the inverse *lumped pressure mass matrix* (spectrally
equivalent to S for Stokes), with the constant-pressure nullspace handled
by mean projection in the M_p inner product (no pinned DOF).

No reference counterpart: the reference has neither mixed elements nor
iterative solvers (dense LU only, torch_fem/basis/abstract_basis.py:177-195).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .solvers import PCGInfo, pcg

__all__ = ["StokesInfo", "schur_flexible_cg", "stokes_solver"]


class StokesInfo(NamedTuple):
    outer_iterations: jnp.ndarray
    schur_residual: jnp.ndarray
    converged: jnp.ndarray
    inner_info: PCGInfo  # from the final velocity solve
    # total inner A-solve PCG iterations across the whole solve (initial
    # f-solve + every Schur application + the velocity recovery); None on
    # paths that do not account them (eager solver, minres)
    inner_total: Optional[jnp.ndarray] = None


def schur_flexible_cg(
    rhs_p,
    x0,
    *,
    apply_bt_w: Callable,
    solve_a: Callable,
    schur_out: Callable,
    precond_p: Callable,
    dot_w: Callable,
    zeros_red,
    tol: float,
    inner_tol: float,
    inner_eta: float,
    inner_tol_max: float,
    outer_cap: int,
    stall_patience: int = 10,
):
    """Flexible outer CG on the Schur complement with warm-started,
    tolerance-relaxed inner A-solves — the one implementation behind both
    ``ops.compiled.compiled_stokes_solver`` (method="schur") and
    ``parallel.sharded_stokes_solver``.

    The two classic inner-solve economies (the fixed-inner-tol version
    spent 17 outer x full 1e-6 inner solves = 2.04 s at 107k velocity DOFs
    on chip):

    1. WARM START: each inner solve starts from the previous inner
       solution scaled by the 2-norm-optimal coefficient
       ``gamma = <w_k, w_{k-1}> / <w_{k-1}, w_{k-1}>`` (A y_{k-1} ~ w_{k-1}
       to solver precision, so gamma y_{k-1} minimizes the starting
       residual over the single direction y_{k-1}; gamma ~ 0 when the new
       rhs is uncorrelated, recovering the zero start).
    2. RELAXED TOLERANCE (van den Eshof & Sleijpen / Simoncini-Szyld
       inexact-Krylov): the inner tolerance may grow inversely with the
       outer residual, ``tol_k = eta * tol * ||r_0|| / ||r_k||``, because
       late perturbations enter the true residual weighted by the (small)
       current outer residual. Clamped to [inner_tol, inner_tol_max]. The
       outer beta is Polak-Ribiere (flexible CG), which tolerates the
       resulting non-stationarity.

    Hooks (the only places the single-chip and row-sharded variants
    differ):

    - ``apply_bt_w(d)``: pressure direction (n_p,) -> B^T d in the reduced
      velocity layout (padded full rows single-chip; this shard's owned
      rows sharded).
    - ``solve_a(rhs_red, x0_red, tol_k) -> (y, info)``: inner A-solve in
      that layout.
    - ``schur_out(y)``: reduced velocity -> mean-projected B y, replicated
      (n_p,).
    - ``precond_p(r)``: lumped-pressure-mass preconditioner, (n_p,).
    - ``dot_w(a, b)``: dot in the reduced layout (``jnp.sum`` single-chip,
      a psum'd sum sharded). Pressure-space dots are always plain
      ``jnp.sum`` — (n_p,) vectors are replicated in both variants.

    Returns ``(p_flat, res_fin, k_out, atol, inner_iters, u_bt)``; the
    caller judges convergence as ``res_fin <= atol`` and runs its own
    velocity recovery. ``inner_iters`` is the total inner-PCG iteration
    count across the initial Schur apply and every outer step (the
    recovery solve is the caller's to add).

    ``u_bt`` is the FREE velocity by-product: the outer iterate is
    ``p = x0 + sum_k alpha_k d_k`` and every Schur apply already computed
    ``y_k ~ A^{-1} B^T d_k``, so ``u_bt = y_0 + sum_k alpha_k y_k``
    approximates ``A^{-1} B^T p`` at no extra cost — the caller's velocity
    recovery ``A u = f - B^T p`` warm-starts from ``u_f - u_bt`` (error =
    the alpha-weighted inner-solve errors, exactly the quantity the
    van den Eshof relaxation keeps below ~tol), which measured on chip
    cuts the recovery solve from ~80-140 inner iterations to a handful.

    INEXACT-MODE HYGIENE: when the inner solves are loose (large
    ``inner_tol_max``, or the caller's fixed-iteration ``solve_a``), the
    recurrence can hit its attainable-accuracy floor below the requested
    ``tol``, and a too-inexact apply can even present an indefinite
    operator (``d^T S~ d <= 0``) that would send plain CG divergent (to
    the outer cap, then NaN — observed). Three guards keep the returned
    iterate honest: (1) the BEST iterate (smallest outer residual norm,
    with its matching ``u_bt``) is tracked and returned if the final one
    is worse; (2) a non-positive curvature or non-finite update stops the
    loop immediately without applying the bad step; (3) the loop stops
    after ``stall_patience`` consecutive iterations without a new best
    residual. ``converged`` (judged by the caller as res_fin <= atol)
    stays False on a floor-stop — the floor is reported, not hidden.
    """
    tiny = jnp.finfo(rhs_p.dtype).tiny
    b_norm = jnp.sqrt(jnp.sum(rhs_p * rhs_p))
    atol = tol * jnp.maximum(b_norm, tiny)

    def schur_apply(d_flat, y_prev, w_prev, tol_k):
        w = apply_bt_w(d_flat)
        gamma = dot_w(w, w_prev) / jnp.maximum(dot_w(w_prev, w_prev), tiny)
        y, info = solve_a(w, gamma * y_prev, tol_k)
        return schur_out(y), y, w, info.iterations

    # initial residual: one Schur apply against the caller's x0 (zero by
    # default, where the inner PCG exits after 0 iterations on ||b||=0)
    sx0, y0, w0, it0 = schur_apply(x0, zeros_red, zeros_red, inner_tol)
    r0 = rhs_p - sx0
    z0 = precond_p(r0)
    r0_norm = jnp.sqrt(jnp.sum(r0 * r0))

    def cond(state):
        (_, r, _, _, _, _, _, k, _, _, _, _, _, since_best, stop) = state
        return (
            (k < outer_cap)
            & (jnp.sqrt(jnp.sum(r * r)) > atol)
            & (~stop)
            & (since_best < stall_patience)
        )

    def body(state):
        (xp, r, z, d, rz, y_prev, w_prev, k, it_tot, u_bt,
         best_xp, best_ubt, best_norm, since_best, _) = state
        r_norm = jnp.sqrt(jnp.sum(r * r))
        tol_k = jnp.clip(
            inner_eta * tol * r0_norm / jnp.maximum(r_norm, tiny),
            inner_tol,
            inner_tol_max,
        )
        sd, y_new, w_new, it_k = schur_apply(d, y_prev, w_prev, tol_k)
        denom = jnp.sum(d * sd)
        # inexact applies can present an indefinite operator; a
        # non-positive-curvature step would diverge — stop without it
        ok = denom > 0
        alpha = jnp.where(ok, rz / jnp.where(ok, denom, 1.0), 0.0)
        xp_new = xp + alpha * d
        u_bt_new = u_bt + alpha * y_new
        r_new = r - alpha * sd
        z_new = precond_p(r_new)
        # Polak-Ribiere (flexible) beta: exact-CG-equivalent when the
        # operator is stationary, robust when the inner tol varies
        beta = jnp.sum((r_new - r) * z_new) / rz
        rz_new = jnp.sum(r_new * z_new)
        d_new = z_new + beta * d
        new_norm = jnp.sqrt(jnp.sum(r_new * r_new))
        stop = (~ok) | (~jnp.isfinite(new_norm)) | (~jnp.isfinite(rz_new))
        improved = (~stop) & (new_norm < best_norm)
        best_xp = jnp.where(improved, xp_new, best_xp)
        best_ubt = jnp.where(improved, u_bt_new, best_ubt)
        best_norm = jnp.where(improved, new_norm, best_norm)
        since_best = jnp.where(improved, 0, since_best + 1)
        # a stopped step keeps the previous iterate (the bad update is
        # never applied); the loop then exits via cond
        keep = ~stop
        return (
            jnp.where(keep, xp_new, xp),
            jnp.where(keep, r_new, r),
            z_new, d_new, rz_new, y_new, w_new, k + 1,
            it_tot + it_k,
            jnp.where(keep, u_bt_new, u_bt),
            best_xp, best_ubt, best_norm, since_best, stop,
        )

    state = (x0, r0, z0, z0, jnp.sum(r0 * z0), y0, w0, 0, it0, y0,
             x0, y0, r0_norm, 0, False)
    (p_flat, r_fin, _, _, _, _, _, k_out, it_tot, u_bt,
     best_xp, best_ubt, best_norm, _, _) = jax.lax.while_loop(
        cond, body, state
    )
    res_fin = jnp.sqrt(jnp.sum(r_fin * r_fin))
    # return the best iterate seen (== the final one whenever the loop
    # converged monotonically; differs only on floor/stall exits)
    take_best = best_norm < res_fin
    p_flat = jnp.where(take_best, best_xp, p_flat)
    u_bt = jnp.where(take_best, best_ubt, u_bt)
    res_fin = jnp.minimum(res_fin, best_norm)
    return p_flat, res_fin, k_out, atol, it_tot, u_bt


def stokes_solver(
    velocity_basis,
    pressure_basis,
    a_form: Callable,
    b_form: Callable,
    *,
    tol: float = 1e-8,
    maxiter: Optional[int] = None,
    inner_tol: float = 1e-11,
    inner_precondition: str = "two_level",
    mass_form: Optional[Callable] = None,
):
    """Build ``solve(f, g=None) -> (u, p, StokesInfo)`` for a fixed pair of
    bases and forms.

    Args:
      velocity_basis: the A-block basis (typically a ``VectorBasis``);
        Dirichlet velocity DOFs come from its markers (homogeneous — lift
        non-homogeneous data into ``f``/``g`` first).
      pressure_basis: the constraint-space basis (no Dirichlet DOFs
        expected; the constant mode is projected out, not pinned).
      a_form: closure ``basis -> (T, q, n_u_loc, n_u_loc)`` for A (SPD).
      b_form: closure ``(test_p, trial_u) -> (T, q, n_p_loc, n_u_loc)`` for
        B (e.g. ``-q div(u)``), with matching integration orders.
      tol: relative Schur-CG tolerance (in the lumped-M_p-preconditioned
        norm).
      inner_tol: tolerance for the inner A-solves. Schur-CG sees A^{-1}
        only through these solves, so keep inner_tol well below tol
        (inexact inner solves make S applications inconsistent between
        iterations).
      mass_form: pressure mass integrand (defaults to ``q.v @ q.v^T``),
        used for the lumped preconditioner and the mean projection.

    Returns a ``solve`` whose pressure has zero lumped-mass mean.
    """
    Vu, Vp = velocity_basis, pressure_basis
    local_a = Vu.integrate_bilinear_form_local(a_form)
    local_b = Vp.integrate_mixed_bilinear_form_local(Vu, b_form)
    if mass_form is None:
        mass_form = lambda b_: b_.v @ jnp.matrix_transpose(b_.v)
    # lumped pressure mass: row sums of the assembled M_p = assembled
    # local row sums (scatter of a linear-form-shaped local)
    mp_lumped = Vp._assemble_linear_from_local(
        Vp.integrate_bilinear_form_local(mass_form).sum(-1, keepdims=True)
    )  # (n_p, 1)
    mp_total = mp_lumped.sum()
    u_dofs = Vu._global_dofs4elements
    p_dofs = Vp._global_dofs4elements
    local_bt = jnp.matrix_transpose(local_b)

    def apply_b(u_vec):
        """B u: (n_u, 1) -> (n_p, 1)."""
        u_cells = u_vec[..., 0][u_dofs][..., None]  # (T, n_u_loc, 1)
        return Vp._assemble_linear_from_local(local_b @ u_cells)

    def apply_bt(p_vec):
        """B^T p: (n_p, 1) -> (n_u, 1)."""
        p_cells = p_vec[..., 0][p_dofs][..., None]  # (T, n_p_loc, 1)
        return Vu._assemble_linear_from_local(local_bt @ p_cells)

    def project_mean(p_vec):
        """Remove the constant mode in the lumped-M_p inner product."""
        mean = (mp_lumped * p_vec).sum() / mp_total
        return p_vec - mean

    def solve_a(rhs):
        return Vu.solve_iterative(
            local_a,
            rhs,
            tol=inner_tol,
            precondition=inner_precondition,
            symmetric_form=True,
            return_info=True,
        )

    def solve(f, g=None, x0=None):
        u_f, info_f = solve_a(f)
        rhs_p = apply_b(u_f)
        if g is not None:
            rhs_p = rhs_p - g
        rhs_p = project_mean(rhs_p)
        del info_f  # per-apply inner infos are trace-time artifacts

        def schur(p_flat):
            w = apply_bt(p_flat[:, None])
            y, _ = solve_a(w)
            return project_mean(apply_b(y))[:, 0]

        inv_lump = 1.0 / mp_lumped[:, 0]
        p_flat, schur_info = pcg(
            schur,
            rhs_p[:, 0],
            x0=None if x0 is None else x0[:, 0],
            precond=lambda r: project_mean((inv_lump * r)[:, None])[:, 0],
            tol=tol,
            maxiter=maxiter,
        )
        p = project_mean(p_flat[:, None])
        u, info_u = solve_a(f - apply_bt(p))
        info = StokesInfo(
            outer_iterations=schur_info.iterations,
            schur_residual=schur_info.residual_norm,
            converged=schur_info.converged,
            inner_info=info_u,
        )
        return u, p, info

    return solve
