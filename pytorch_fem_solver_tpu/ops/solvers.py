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
