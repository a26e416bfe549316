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
