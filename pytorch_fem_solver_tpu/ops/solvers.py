"""Linear solvers: dense direct (parity) and matrix-free Jacobi-PCG (TPU path).

The PCG loop is a single ``lax.while_loop`` — fully jittable, no host
round-trips per iteration, and safe to wrap in ``shard_map`` (dot products
reduce with ``psum`` when the operand vectors are sharded; see
``parallel.sharding``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


class PCGInfo(NamedTuple):
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray
    converged: jnp.ndarray


def dense_solve(matrix, vector):
    """Dense LU solve (parity with torch.linalg.solve in the reference)."""
    return jnp.linalg.solve(matrix, vector)


def pcg(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    precond_diag: Optional[jnp.ndarray] = None,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    dot: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = None,
):
    """Preconditioned conjugate gradients.

    Args:
      matvec: SPD operator action on a vector shaped like ``b``.
      b: right-hand side (n,).
      x0: initial guess (defaults to zeros).
      precond_diag: operator diagonal; Jacobi preconditioner M = diag(A).
      precond: general SPD preconditioner application z = M^{-1} r
        (overrides ``precond_diag``; e.g. the two-level preconditioner in
        ``ops.precondition``).
      tol: relative residual tolerance ||r|| <= tol * ||b||.
      maxiter: iteration cap (defaults to 10 * n, a safe CG bound).
      dot: inner product — override with a psum-reducing dot when running
        sharded under ``shard_map``.

    Returns ``(x, PCGInfo)``; runs a fixed-structure while_loop so the whole
    solve stays on device.
    """
    n = b.shape[-1]
    if maxiter is None:
        maxiter = max(10 * n, 100)
    if dot is None:
        dot = lambda u, v: jnp.sum(u * v)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        if precond_diag is None:
            precond = lambda r: r
        else:
            safe = jnp.where(precond_diag != 0, precond_diag, 1.0)
            inv_diag_arr = 1.0 / safe
            precond = lambda r: inv_diag_arr * r

    b_norm = jnp.sqrt(dot(b, b))
    atol2 = (tol * jnp.maximum(b_norm, 1e-300)) ** 2

    r0 = b - matvec(x0)
    z0 = precond(r0)
    rz0 = dot(r0, z0)

    def cond(state):
        _, r, _, _, k = state
        return jnp.logical_and(k < maxiter, dot(r, r) > atol2)

    def body(state):
        x, r, p, rz, k = state
        ap = matvec(p)
        alpha = rz / dot(p, ap)
        x = x + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, r, _, _, k = jax.lax.while_loop(cond, body, (x0, r0, z0, rz0, 0))
    res = jnp.sqrt(dot(r, r))
    info = PCGInfo(iterations=k, residual_norm=res, converged=res <= jnp.sqrt(atol2))
    return x, info


def cg(matvec, b, **kwargs):
    """Unpreconditioned CG (Jacobi disabled)."""
    kwargs.setdefault("precond_diag", None)
    return pcg(matvec, b, **kwargs)


def pcg_cols(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    B: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol=1e-10,
    maxiter: Optional[int] = None,
):
    """Block-diagonal multi-rhs PCG: m INDEPENDENT CG recurrences on the
    SAME operator, advanced in lockstep on (n, m) column stacks.

    Not block-CG (no cross-column coupling): each column keeps its own
    alpha/beta from per-column dots. The win is per-iteration economics —
    the operator values stream once for all m columns and the BSR gathers
    are charged per row descriptor regardless of the (k, m) payload
    (``ops.bsr.bsr_matvec_cols``). Converged columns are frozen (their
    alpha/beta masked to zero) so the loop runs to the LAST column's
    convergence without perturbing finished solutions; with the intended
    use (the component-decoupled Stokes A block: same operator, same
    boundary, comparable data) the per-column counts track each other
    closely.

    ``tol`` is the per-column relative residual tolerance (scalar or
    (m,)). Returns ``(X, PCGInfo)`` with iterations = the shared loop
    count and residual_norm/converged per column.
    """
    n, m = B.shape
    if maxiter is None:
        maxiter = max(10 * n, 100)
    if x0 is None:
        x0 = jnp.zeros_like(B)
    if precond is None:
        precond = lambda r: r
    dot = lambda u, v: jnp.sum(u * v, axis=0)  # (m,)
    tiny = jnp.finfo(B.dtype).tiny

    b_norm2 = dot(B, B)
    atol2 = (jnp.asarray(tol, dtype=B.dtype) ** 2) * jnp.maximum(
        b_norm2, tiny
    )

    r0 = B - matvec(x0)
    z0 = precond(r0)
    rz0 = dot(r0, z0)

    def cond(state):
        _, r, _, _, k = state
        return jnp.logical_and(
            k < maxiter, jnp.any(dot(r, r) > atol2)
        )

    def body(state):
        x, r, p, rz, k = state
        active = dot(r, r) > atol2  # (m,)
        ap = matvec(p)
        denom = dot(p, ap)
        alpha = jnp.where(
            active, rz / jnp.where(denom == 0, 1.0, denom), 0.0
        )
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * ap
        z = precond(r)
        rz_new = dot(r, z)
        beta = jnp.where(
            active, rz_new / jnp.where(rz == 0, 1.0, rz), 0.0
        )
        p = jnp.where(active[None, :], z + beta[None, :] * p, p)
        rz = jnp.where(active, rz_new, rz)
        return (x, r, p, rz, k + 1)

    x, r, _, _, k = jax.lax.while_loop(cond, body, (x0, r0, z0, rz0, 0))
    res = jnp.sqrt(dot(r, r))
    info = PCGInfo(
        iterations=k,
        residual_norm=res,
        converged=jnp.all(res * res <= atol2),
    )
    return x, info


def minres(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    dot: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = None,
    restart: Optional[int] = None,
):
    """Preconditioned MINRES (Paige & Saunders) for symmetric, possibly
    INDEFINITE operators.

    The saddle-point (Stokes) system is symmetric indefinite, so CG does
    not apply; MINRES minimizes the preconditioned residual over the Krylov
    space with one matvec and one preconditioner application per iteration
    — this is what makes the block-diagonal-preconditioned full-system
    solve cheaper than Schur CG, whose every operator application hides a
    full inner A-solve (``ops.saddle``).

    Args:
      matvec: symmetric operator action.
      precond: application of an SPD (or PSD with nullspace orthogonal to
        the residuals — e.g. the mean-projected pressure mass inverse)
        preconditioner M^{-1}. Identity when omitted.
      tol: relative tolerance on the M^{-1}-norm residual,
        ||r_k||_{M^{-1}} <= tol * ||r_0||_{M^{-1}} (the norm the Lanczos
        recurrence tracks for free).
      restart: when set, every ``restart`` iterations the TRUE residual
        ``r = b - K x`` is recomputed and the Lanczos/QR recurrence is
        re-seeded from it (periodic true-residual replacement). This is
        the f32 cure for the round-3 on-chip failure mode: over hundreds
        of f32 iterations the tracked preconditioned-residual recurrence
        drifts ~100% off the true residual, so the solver "converges" to
        a wrong solution. With replacement the stopping test is anchored
        to the true residual at every restart, at the cost of one extra
        matvec per ``restart`` iterations (and the usual restarted-Krylov
        convergence penalty — keep ``restart`` >= ~40). The final
        residual_norm/converged are recomputed from the true residual.

    Returns ``(x, PCGInfo)``; residual_norm is the preconditioned norm.
    Stops early on Lanczos breakdown (beta ~ 0: solution found in exact
    arithmetic) with converged judged by the tracked residual.
    """
    n = b.shape[-1]
    if restart is not None and int(restart) < 1:
        # a traced (k + 1) % 0 is undefined in XLA — fail loudly instead;
        # "no restarts" is spelled restart=None
        raise ValueError(f"restart must be >= 1 (or None), got {restart}")
    if maxiter is None:
        maxiter = max(10 * n, 100)
    if dot is None:
        dot = lambda u, v: jnp.sum(u * v)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        precond = lambda r: r
    eps = jnp.finfo(b.dtype).eps
    tiny = jnp.finfo(b.dtype).tiny

    r1 = b - matvec(x0)
    y = precond(r1)
    # the PSD-preconditioner contract keeps this non-negative; clamp the
    # f32 rounding tail so sqrt never NaNs
    beta1 = jnp.sqrt(jnp.maximum(dot(r1, y), 0.0))
    rtol = tol * jnp.maximum(beta1, tiny)

    def cond(state):
        _, _, _, _, _, beta, _, _, phibar, _, _, _, _, k = state
        return jnp.logical_and(
            k < maxiter,
            jnp.logical_and(phibar > rtol, beta > eps * jnp.maximum(beta1, tiny)),
        )

    def body(state):
        (x, r1_, r2, y_, oldb, beta, dbar, epsln, phibar, cs, sn, w, w2, k) = state
        v = y_ / beta
        av = matvec(v)
        # three-term Lanczos: subtract the previous direction (none at
        # k=0 and right after a true-residual refresh, both oldb == 0)
        has_prev = oldb > 0
        coef = jnp.where(has_prev, beta / jnp.where(has_prev, oldb, 1.0), 0.0)
        av = av - coef * r1_
        alfa = dot(v, av)
        av = av - (alfa / beta) * r2
        r1n, r2n = r2, av
        yn = precond(r2n)
        oldb_n = beta
        beta_n = jnp.sqrt(jnp.maximum(dot(r2n, yn), 0.0))
        # previous rotation applied to the new tridiagonal column
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * beta_n
        dbar_n = -cs * beta_n
        gamma = jnp.maximum(jnp.sqrt(gbar**2 + beta_n**2), eps)
        cs_n = gbar / gamma
        sn_n = beta_n / gamma
        phi = cs_n * phibar
        phibar_n = sn_n * phibar
        w1, w2n = w2, w
        wn = (v - oldeps * w1 - delta * w2n) / gamma
        xn = x + phi * wn
        state_n = (
            xn, r1n, r2n, yn, oldb_n, beta_n, dbar_n, epsln_n,
            phibar_n, cs_n, sn_n, wn, w2n, k + 1,
        )
        if restart is None:
            return state_n

        def refresh(s):
            xr = s[0]
            kr = s[13]
            rr = b - matvec(xr)
            yr = precond(rr)
            br = jnp.sqrt(jnp.maximum(dot(rr, yr), 0.0))
            z = jnp.zeros((), dtype=b.dtype)
            return (
                xr, rr, rr, yr, z, br, z, z, br,
                -jnp.ones((), dtype=b.dtype), z,
                jnp.zeros_like(b), jnp.zeros_like(b), kr,
            )

        return jax.lax.cond(
            (k + 1) % restart == 0, refresh, lambda s: s, state_n
        )

    zero = jnp.zeros((), dtype=b.dtype)
    state = (
        x0, r1, r1, y, zero, beta1, zero, zero, beta1,
        -jnp.ones((), dtype=b.dtype), zero,
        jnp.zeros_like(b), jnp.zeros_like(b), 0,
    )
    out = jax.lax.while_loop(cond, body, state)
    x, phibar, k = out[0], out[8], out[13]
    if restart is not None:
        # anchor the reported result to the TRUE residual, not the
        # recurrence (which is exactly what f32 drift corrupts)
        r_true = b - matvec(x)
        y_true = precond(r_true)
        phibar = jnp.sqrt(jnp.maximum(dot(r_true, y_true), 0.0))
    info = PCGInfo(
        iterations=k, residual_norm=phibar, converged=phibar <= rtol
    )
    return x, info


def bicgstab(
    matvec: Callable[[jnp.ndarray], jnp.ndarray],
    b: jnp.ndarray,
    x0: Optional[jnp.ndarray] = None,
    precond_diag: Optional[jnp.ndarray] = None,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    dot: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray] = None,
):
    """Preconditioned BiCGStab for NON-symmetric operators (van der Vorst).

    Same interface and while_loop structure as :func:`pcg`; needed for
    Newton linearizations (``AbstractBasis.solve_newton``), whose local
    Jacobians are generally not symmetric, so CG would silently diverge.
    Two matvecs and two preconditioner applications per iteration; the
    preconditioner may be any of the SPD preconditioners in
    ``ops.precondition`` (applied as a left/right-split would be — here in
    the standard preconditioned-BiCGStab form with M^-1 applied to the
    search directions). Breakdown (rho or omega ~ 0) is handled by
    freezing the state and reporting non-convergence rather than emitting
    NaNs. No reference counterpart (the reference only has dense LU).
    """
    n = b.shape[-1]
    if maxiter is None:
        maxiter = max(10 * n, 100)
    if dot is None:
        dot = lambda u, v: jnp.sum(u * v)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if precond is None:
        if precond_diag is None:
            precond = lambda r: r
        else:
            safe = jnp.where(precond_diag != 0, precond_diag, 1.0)
            inv_diag_arr = 1.0 / safe
            precond = lambda r: inv_diag_arr * r

    b_norm = jnp.sqrt(dot(b, b))
    atol2 = (tol * jnp.maximum(b_norm, 1e-300)) ** 2
    eps = jnp.finfo(b.dtype).tiny

    r0 = b - matvec(x0)
    rhat = r0  # shadow residual, fixed

    def cond(state):
        _, r, *_, k, ok = state
        return jnp.logical_and(
            jnp.logical_and(k < maxiter, dot(r, r) > atol2), ok
        )

    def body(state):
        x, r, p, v, rho, alpha, omega, k, ok = state
        rho_new = dot(rhat, r)
        ok = jnp.abs(rho_new) > eps
        beta = jnp.where(ok, (rho_new / rho) * (alpha / omega), 0.0)
        p = r + beta * (p - omega * v)
        p_hat = precond(p)
        v = matvec(p_hat)
        rhat_v = dot(rhat, v)
        ok = jnp.logical_and(ok, jnp.abs(rhat_v) > eps)
        alpha = jnp.where(ok, rho_new / jnp.where(ok, rhat_v, 1.0), 0.0)
        s = r - alpha * v
        s_hat = precond(s)
        t = matvec(s_hat)
        tt = dot(t, t)
        omega_ok = tt > eps
        omega = jnp.where(omega_ok, dot(t, s) / jnp.where(omega_ok, tt, 1.0), 0.0)
        omega_ok = jnp.logical_and(omega_ok, jnp.abs(omega) > eps)
        # omega breakdown (t ~ 0): keep the alpha half step x + alpha p_hat
        # with residual s, then stop; rho/rhat_v breakdown: freeze entirely
        x_half = x + alpha * p_hat
        r_half = s
        x = jnp.where(ok, jnp.where(omega_ok, x_half + omega * s_hat, x_half), x)
        r = jnp.where(ok, jnp.where(omega_ok, s - omega * t, r_half), r)
        ok = jnp.logical_and(ok, omega_ok)
        omega = jnp.where(omega_ok, omega, 1.0)
        return (x, r, p, v, rho_new, alpha, omega, k + 1, ok)

    one = jnp.ones((), dtype=b.dtype)
    state = (x0, r0, jnp.zeros_like(b), jnp.zeros_like(b), one, one, one, 0, jnp.array(True))
    x, r, *_, k, _ = jax.lax.while_loop(cond, body, state)
    res = jnp.sqrt(dot(r, r))
    info = PCGInfo(
        iterations=k, residual_norm=res, converged=res <= jnp.sqrt(atol2)
    )
    return x, info
