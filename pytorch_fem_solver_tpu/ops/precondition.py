"""Two-level (aggregation-deflation) preconditioner for the reduced system.

Plain Jacobi leaves the low-frequency error modes to CG, costing O(1/h)
iterations. A coarse correction over piecewise-constant aggregates removes
them:

    M^{-1} r = D^{-1} r + R A_c^{-1} R^T r,      A_c = R^T A R

with aggregates chosen as *contiguous, equal-size index blocks* so that on
TPU the restriction/prolongation are reshape-reduces and broadcasts — zero
gathers — and the coarse solve is one small dense matmul against a
precomputed inverse. The additive combination of two SPD operators is SPD,
so CG theory applies unchanged.

Index-contiguous aggregates work because mesh construction orders vertices
with strong spatial locality (structured grids row-major, PSLG meshes by
generation front); even imperfect aggregates deflate enough low modes to cut
iteration counts several-fold.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .sparse import ELLStructure


class TwoLevelPreconditioner(NamedTuple):
    inv_diag: jnp.ndarray  # (n,)
    coarse_inv: jnp.ndarray  # (nb, nb) dense inverse of R^T A R
    block: int
    n: int
    n_pad: int

    def __call__(self, r: jnp.ndarray) -> jnp.ndarray:
        fine = self.inv_diag * r
        r_pad = jnp.concatenate(
            [r, jnp.zeros((self.n_pad - self.n,), dtype=r.dtype)]
        )
        r_coarse = r_pad.reshape(-1, self.block).sum(axis=-1)
        z_coarse = self.coarse_inv @ r_coarse
        z_pad = jnp.repeat(z_coarse, self.block, total_repeat_length=self.n_pad)
        return fine + z_pad[: self.n]


def build_two_level(
    structure: ELLStructure, values, diag, block: int = 128
) -> TwoLevelPreconditioner:
    """Build the two-level preconditioner from an assembled ELL operator.

    ``A_c[a, b] = sum of entries with row in aggregate a, col in aggregate
    b`` — computed with one scatter-add over the ELL slots (setup-time only).
    """
    n = structure.n_inner
    K = structure.cols.shape[1]
    nb = -(-n // block)
    n_pad = nb * block

    rows = jnp.repeat(
        jnp.arange(n, dtype=structure.cols.dtype)[:, None], K, axis=1
    )
    row_agg = rows // block
    col_agg = structure.cols // block
    bins = (row_agg * nb + col_agg).reshape(-1)
    vals = (values * structure.pad_mask).reshape(-1)
    coarse = jax.ops.segment_sum(vals, bins, num_segments=nb * nb).reshape(nb, nb)

    # symmetrize against f32 roundoff before inverting
    coarse = 0.5 * (coarse + coarse.T)
    # aggregates of pure-Neumann pieces could be singular in principle;
    # a tiny diagonal shift keeps the inverse stable without affecting
    # preconditioning quality
    shift = 1e-8 * jnp.trace(coarse) / nb
    coarse_inv = jnp.linalg.inv(coarse + shift * jnp.eye(nb, dtype=coarse.dtype))

    safe = jnp.where(diag != 0, diag, 1.0)
    return TwoLevelPreconditioner(
        inv_diag=1.0 / safe,
        coarse_inv=coarse_inv,
        block=block,
        n=n,
        n_pad=n_pad,
    )
