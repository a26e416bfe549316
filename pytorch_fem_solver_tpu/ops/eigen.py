"""Generalized symmetric eigensolver: smallest modes of A x = lambda M x.

Matrix-free shift-invert subspace iteration on the reduced (interior-DOF)
operators: each round applies A^{-1} M to the subspace with the existing
PCG machinery (``ops.solvers.pcg``, optionally preconditioned by the
two-level preconditioners in ``ops.precondition``), then Rayleigh-Ritz
projects onto the subspace (dense k x k generalized eigenproblem via a
Cholesky whitening + ``eigh``). The whole iteration is jittable — vmapped
PCG columns inside a ``lax.while_loop``-driven solver, host loop only over
the few outer rounds.

No reference counterpart: the reference has no eigen capability at all
(dense LU solves only, torch_fem/basis/abstract_basis.py:177-195). Modal
analysis (Laplace spectra, elastic vibration modes) is a standard FEM
workload the TPU build adds.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .solvers import pcg

__all__ = [
    "EighInfo",
    "lobpcg_eigsh",
    "subspace_eigsh",
    "subspace_eigsh_while",
]


class EighInfo(NamedTuple):
    iterations: int
    eig_change: float
    converged: bool


def _rayleigh_ritz(y, a_mv, m_mv):
    """Project onto span(y): return (eigenvalues, coefficient matrix)."""
    ay = a_mv(y)
    my = m_mv(y)
    g_a = y.T @ ay
    g_m = y.T @ my
    # symmetrize against roundoff before factorization
    g_a = 0.5 * (g_a + g_a.T)
    g_m = 0.5 * (g_m + g_m.T)
    chol = jnp.linalg.cholesky(g_m)
    li = jax.scipy.linalg.solve_triangular(chol, jnp.eye(chol.shape[0], dtype=chol.dtype), lower=True)
    white = li @ g_a @ li.T
    vals, w = jnp.linalg.eigh(0.5 * (white + white.T))
    return vals, li.T @ w


def subspace_eigsh(
    a_matvec: Callable[[jnp.ndarray], jnp.ndarray],
    m_matvec: Callable[[jnp.ndarray], jnp.ndarray],
    n: int,
    k: int = 6,
    *,
    n_extra: Optional[int] = None,
    tol: float = 1e-9,
    max_rounds: int = 60,
    solve_tol: float = 1e-10,
    solve_maxiter: Optional[int] = None,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    precond_diag: Optional[jnp.ndarray] = None,
    seed: int = 0,
    dtype=None,
    x0: Optional[jnp.ndarray] = None,
):
    """Smallest ``k`` eigenpairs of the pencil (A, M), both SPD.

    Args:
      a_matvec / m_matvec: operator actions on single vectors (n,).
      n: reduced system size.
      k: number of eigenpairs to return.
      n_extra: guard vectors beyond ``k`` (default ``max(2, k // 2)``) —
        the trailing subspace vectors converge slowest, so the guard keeps
        the returned pairs accurate.
      tol: relative eigenvalue-change stopping threshold between rounds.
      solve_tol / solve_maxiter / precond / precond_diag: inner PCG knobs
        for the A-solves.
      seed / dtype: starting-block generation.
      x0: explicit starting block (n, >=k) — REQUIRED when the operators
        act on a padded layout (e.g. the BSR-reduced system, where padding
        rows must start and stay exactly zero); the random default fills
        every row.

    Returns ``(eigenvalues (k,), eigenvectors (n, k), EighInfo)`` with
    M-orthonormal eigenvectors, eigenvalues ascending.
    """
    if dtype is None:
        dtype = jnp.zeros(0).dtype
    m = min(n, k + (n_extra if n_extra is not None else max(2, k // 2)))
    if k > n:
        raise ValueError(f"requested k={k} eigenpairs from an n={n} system")

    if x0 is not None:
        if x0.shape[0] != n or x0.shape[1] < m:
            raise ValueError(
                f"x0 must be ({n}, >={m}); got {tuple(x0.shape)}"
            )
        x = x0[:, :m].astype(dtype)
    else:
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.standard_normal((n, m)), dtype=dtype)

    a_mv_block = jax.vmap(a_matvec, in_axes=1, out_axes=1)
    m_mv_block = jax.vmap(m_matvec, in_axes=1, out_axes=1)

    @jax.jit
    def round_step(x):
        # y = A^{-1} (M x), column-wise PCG (vmapped while_loops)
        mx = m_mv_block(x)

        def solve_col(b):
            y, _ = pcg(
                a_matvec,
                b,
                precond=precond,
                precond_diag=precond_diag,
                tol=solve_tol,
                maxiter=solve_maxiter,
            )
            return y

        y = jax.vmap(solve_col, in_axes=1, out_axes=1)(mx)
        # M-orthonormalize the block before projecting (QR in the M inner
        # product via Cholesky of y^T M y, folded into Rayleigh-Ritz)
        vals, coeffs = _rayleigh_ritz(y, a_mv_block, m_mv_block)
        return vals, y @ coeffs

    last = None
    info = EighInfo(iterations=0, eig_change=np.inf, converged=False)
    for rounds in range(1, max_rounds + 1):
        vals, x = round_step(x)
        head = np.asarray(vals[:k])
        if last is not None:
            change = float(
                np.max(np.abs(head - last) / np.maximum(np.abs(head), 1e-300))
            )
            info = EighInfo(
                iterations=rounds, eig_change=change, converged=change <= tol
            )
            if info.converged:
                break
        last = head
    return jnp.asarray(vals[:k]), x[:, :k], info


def subspace_eigsh_while(
    a_matvec,
    m_matvec,
    x0: jnp.ndarray,
    k: int,
    *,
    tol: float = 1e-9,
    max_rounds: int = 60,
    solve_tol: float = 1e-10,
    solve_maxiter: Optional[int] = None,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    precond_diag: Optional[jnp.ndarray] = None,
):
    """Fully jittable :func:`subspace_eigsh` core: the outer rounds run as
    a ``lax.while_loop`` instead of a host loop, so the whole eigensolve
    can live inside one XLA program (see
    ``ops.compiled.compiled_eigsh_solver``). ``x0`` (n, m >= k) is the
    starting block (zero on any padding rows). Returns
    ``(vals (k,), vecs (n, k), (rounds, eig_change, converged))`` with
    traced info fields.
    """
    a_mv_block = jax.vmap(a_matvec, in_axes=1, out_axes=1)
    m_mv_block = jax.vmap(m_matvec, in_axes=1, out_axes=1)

    def solve_col(b):
        y, _ = pcg(
            a_matvec,
            b,
            precond=precond,
            precond_diag=precond_diag,
            tol=solve_tol,
            maxiter=solve_maxiter,
        )
        return y

    solve_block = jax.vmap(solve_col, in_axes=1, out_axes=1)

    def round_step(x):
        y = solve_block(m_mv_block(x))
        vals, coeffs = _rayleigh_ritz(y, a_mv_block, m_mv_block)
        return vals, y @ coeffs

    big = jnp.asarray(np.inf, dtype=x0.dtype)

    def cond(state):
        _, _, change, rounds = state
        return jnp.logical_and(change > tol, rounds < max_rounds)

    def body(state):
        x, head_prev, _, rounds = state
        vals, x = round_step(x)
        head = vals[:k]
        change = jnp.max(
            jnp.abs(head - head_prev) / jnp.maximum(jnp.abs(head), 1e-300)
        )
        return (x, head, change, rounds + 1)

    state = (x0, jnp.full((k,), big), big, 0)
    x, head, change, rounds = jax.lax.while_loop(cond, body, state)
    # one more Rayleigh-Ritz would be redundant: head/x already consistent
    return head, x[:, :k], (rounds, change, change <= tol)


def lobpcg_eigsh(
    a_matvec,
    m_matvec,
    x0: jnp.ndarray,
    k: int,
    *,
    tol: float = 1e-9,
    max_rounds: int = 500,
    precond: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    precond_diag: Optional[jnp.ndarray] = None,
    lock_tol: Optional[float] = None,
    psum: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
):
    """Blocked LOBPCG (Knyazev) for the smallest ``k`` pairs of (A, M).

    Same contract as :func:`subspace_eigsh_while` — fully jittable
    ``lax.while_loop``, identical stopping rule (relative eigenvalue
    change of the leading ``k`` values between rounds <= ``tol``) — but a
    fundamentally cheaper round: one A- and M-block-matvec plus ONE
    preconditioner application, where shift-invert subspace iteration pays
    a full inner PCG A-solve per column per round. The trial space
    [X, T(A X - M X Λ), P] keeps the previous search directions, so the
    round count grows only modestly vs the inner-solve-powered rounds.

    f32 stability (the round-3 on-chip failure mode was a catastrophic
    loss of M-orthogonality in the joint 3m x 3m Gram matrix, producing
    garbage Ritz values): the basis is now **explicitly M-orthonormalized
    blockwise before every Rayleigh-Ritz** — W and P are projected against
    the earlier blocks in the M inner product and whitened by a
    rank-revealing eigendecomposition of their own small Gram matrices
    (Cholesky-QR-class cure, rank-tolerant variant), so the joint Gram is
    ~identity and the Ritz step is a well-conditioned standard ``eigh``.
    **Soft locking**: columns whose relative residual
    ``||A x - λ M x|| / ((||A x|| + |λ| ||M x||)`` drops below
    ``lock_tol`` (default ``sqrt(tol)``) stop contributing residual
    directions W, which removes the near-dependent directions that drive
    the Gram collapse in the converged tail.

    ``psum`` is the cross-row reduction hook for the SHARDED path: when the
    block's rows are distributed (``parallel.sharded_eigen``), every Gram
    matrix and column norm is a local partial that must be summed across
    shards — pass ``lambda x: jax.lax.psum(x, axis)``. All other operations
    (column-space updates, the small eigendecompositions) act on replicated
    small matrices or local rows and need no communication.

    Returns ``(vals (k,), vecs (n, k), (rounds, eig_change, converged))``.
    """
    n, m = x0.shape
    dtype = x0.dtype
    if lock_tol is None:
        lock_tol = float(np.sqrt(tol))
    if psum is None:
        psum = lambda x: x
    a_blk = jax.vmap(a_matvec, in_axes=1, out_axes=1)
    m_blk = jax.vmap(m_matvec, in_axes=1, out_axes=1)
    if precond is not None:
        t_blk = jax.vmap(precond, in_axes=1, out_axes=1)
    elif precond_diag is not None:
        safe = jnp.where(precond_diag != 0, precond_diag, 1.0)
        t_blk = lambda r: r / safe[:, None]
    else:
        t_blk = lambda r: r
    eps = jnp.finfo(dtype).eps
    tiny = jnp.finfo(dtype).tiny

    def colnorm(s):
        return jnp.sqrt(psum(jnp.sum(s * s, axis=0)))

    def normalized(s):
        return s / jnp.maximum(colnorm(s), tiny)[None, :]

    def whiten(s, ms, width):
        """M-orthonormalize block ``s`` (its M-image ``ms`` given) via a
        rank-revealing eigendecomposition of the small Gram s^T M s.
        Rank-dropped directions become zero columns; returns the
        transformed (s, ms, valid-column mask)."""
        g = psum(s.T @ ms)
        g = 0.5 * (g + g.T)
        d, q = jnp.linalg.eigh(g)
        dmax = jnp.maximum(jnp.max(jnp.abs(d)), tiny)
        keep = d > (10.0 * width * eps) * dmax
        inv_sqrt = jnp.where(keep, 1.0 / jnp.sqrt(jnp.where(keep, d, 1.0)), 0.0)
        t = q * inv_sqrt[None, :]
        return s @ t, ms @ t, keep

    def rr_ortho(s, as_, valid):
        """Rayleigh-Ritz on an (approximately) M-orthonormal basis:
        standard eigh of the projected A, with rank-dropped (zero) columns
        pushed to +inf so they can never masquerade as smallest modes."""
        ga = psum(s.T @ as_)
        ga = 0.5 * (ga + ga.T)
        big = 2.0 * jnp.max(jnp.abs(ga)) + 1.0
        ga = ga + jnp.diag(jnp.where(valid, 0.0, big))
        return jnp.linalg.eigh(ga)

    def rr_seed(s, width):
        """Rank-tolerant generalized Rayleigh-Ritz used once on the raw
        starting block (which is not yet M-orthonormal)."""
        as_, ms_ = a_blk(s), m_blk(s)
        ga = psum(s.T @ as_)
        ga = 0.5 * (ga + ga.T)
        gm = psum(s.T @ ms_)
        gm = 0.5 * (gm + gm.T)
        d, q = jnp.linalg.eigh(gm)
        dmax = jnp.maximum(jnp.max(jnp.abs(d)), tiny)
        mask = d > (10.0 * width * eps) * dmax
        inv_sqrt = jnp.where(
            mask, 1.0 / jnp.sqrt(jnp.where(mask, d, 1.0)), 0.0
        )
        w = q * inv_sqrt[None, :]
        white = w.T @ ga @ w
        white = 0.5 * (white + white.T)
        big = 2.0 * jnp.max(jnp.abs(white)) + 1.0
        white = white + jnp.diag(jnp.where(mask, 0.0, big))
        evals, evecs = jnp.linalg.eigh(white)
        return evals, w @ evecs

    # seed Ritz step on X alone: M-orthonormal X, initial Λ. The
    # coefficients are computed in the column-normalized basis, so they
    # must be applied to that SAME basis — the body assumes X is exactly
    # M-orthonormal (identity-Gram Ritz, (M X)^T W projections).
    x0n = normalized(x0)
    evals0, c0 = rr_seed(x0n, m)
    x = x0n @ c0[:, :m]
    lam = evals0[:m]

    bigf = jnp.asarray(np.inf, dtype=dtype)

    def cond(state):
        _, _, _, _, change, rounds = state
        return jnp.logical_and(change > tol, rounds < max_rounds)

    def body(state):
        x, p, lam, head_prev, _, rounds = state
        ax = a_blk(x)
        mx = m_blk(x)
        r = ax - mx * lam[None, :]
        # soft locking: converged columns contribute no residual direction
        resn = colnorm(r)
        axn = colnorm(ax)
        mxn = colnorm(mx)
        locked = resn <= lock_tol * jnp.maximum(axn + jnp.abs(lam) * mxn, tiny)
        w = jnp.where(locked[None, :], 0.0, t_blk(r))
        # M-project W off X (X is M-orthonormal from the previous Ritz
        # step, so the projection coefficient is just (M X)^T W), then
        # whiten W in the M inner product
        w = w - x @ psum(mx.T @ w)
        mw = m_blk(w)
        # pre-scale columns to unit 2-norm (the SAME scale on w and its
        # M-image, so the Gram stays exact) before the rank-revealing
        # whitening — keeps the small eigh away from under/overflow
        wscale = 1.0 / jnp.maximum(colnorm(w), tiny)
        w, mw, w_keep = whiten(w * wscale[None, :], mw * wscale[None, :], m)
        # P: M-project off X and W, then whiten
        p = p - x @ psum(mx.T @ p)
        p = p - w @ psum(mw.T @ p)
        mp = m_blk(p)
        pscale = 1.0 / jnp.maximum(colnorm(p), tiny)
        p, mp, p_keep = whiten(p * pscale[None, :], mp * pscale[None, :], m)
        s = jnp.concatenate([x, w, p], axis=1)
        as_ = jnp.concatenate([ax, a_blk(jnp.concatenate([w, p], axis=1))], axis=1)
        valid = jnp.concatenate(
            [jnp.ones((m,), dtype=bool), w_keep, p_keep]
        )
        evals, c = rr_ortho(s, as_, valid)
        x_new = s @ c[:, :m]
        # next conjugate directions: the W/P part of the update only
        p_new = s[:, m:] @ c[m:, :m]
        head = evals[:k]
        change = jnp.max(
            jnp.abs(head - head_prev)
            / jnp.maximum(jnp.abs(head), tiny)
        )
        return (x_new, p_new, evals[:m], head, change, rounds + 1)

    state = (
        x, jnp.zeros_like(x), lam, jnp.full((k,), bigf, dtype=dtype),
        bigf, 0,
    )
    x, _, _, head, change, rounds = jax.lax.while_loop(cond, body, state)
    return head, x[:, :k], (rounds, change, change <= tol)
