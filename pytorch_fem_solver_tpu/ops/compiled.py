"""One-jit compiled assemble+solve pipelines.

``AbstractBasis.solve_iterative`` is correct everywhere but dispatches each
assembly/solve op eagerly — on a tunneled TPU (axon) every op costs ~31 ms
RTT, so a 36k-DOF 3D solve measured 8.4 s eager vs 0.17 s compiled. This
module packages the measured-fast composition from ``bench.py`` as a library
API: all host-side structure building happens once at construction, the hot
per-iteration gather descriptors stay jit constants, and the bulk arrays
(basis tables, one-shot scatter slots) ride in as device-resident jit
arguments — the split that avoids both the 3.5x argument-gather slowdown and
the remote-compile payload wall at the 1M+ DOF scale (HTTP 413; see
docs/performance.md).

The reference library has no counterpart (its solve is a dense
``torch.linalg.solve``, torch_fem/basis/abstract_basis.py:114-131); this is
the TPU-native production solve path.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["compiled_bsr_solver"]


def compiled_bsr_solver(
    basis,
    bilinear_form: Callable,
    linear_form: Optional[Callable] = None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    precondition: str = "auto",
    symmetric_form: bool = True,
    max_b: int = 8,
    operand_dtype=None,
):
    """Build a jitted ``solve() -> (u, info)`` for a fixed basis + forms.

    One XLA program covers local assembly, BSR value scatter, preconditioner
    numeric setup and the PCG loop; calling the returned function costs one
    dispatch. Re-running after geometry-preserving coefficient changes (the
    forms close over arrays) re-uses the compiled program.

    Args:
      basis: any cell basis (2D tri / 3D tet / DFN / vector) with interior
        DOFs; structures are built for its current mesh once, on the host.
      bilinear_form: closure ``basis -> (T, q, n_loc, n_loc)`` integrand.
      linear_form: closure for the right-hand side; if None the returned
        callable takes an assembled global vector ``b`` instead.
      precondition: ``"auto"`` (aggregate-block two-level; rigid-body-mode
        coarse space for vector bases — the measured-best defaults),
        or ``"jacobi"``.
      symmetric_form: enable the canonical-pair scatter (6/9 entries for P1
        triangles, 10/16 for tets); only valid for symmetric forms.
      operand_dtype: reduced-precision preconditioner operands (expert knob;
        bf16 measured fragile at scale, see docs/performance.md).

    Returns:
      ``solve(b=None) -> (u, PCGInfo)`` — jit-compiled end to end.
    """
    from .bsr import (
        bsr_diagonal,
        bsr_expand,
        bsr_matvec,
        bsr_reduce,
        bsr_values_from_local,
        bsr_values_from_local_symmetric,
        get_bsr_structure,
    )
    from .precondition import (
        affine_two_level_from_values,
        agg_block_two_level_from_values,
        build_agg_block_table,
        default_aggregate_size,
        get_affine_two_level_structure,
    )
    from .solvers import pcg

    if precondition not in ("auto", "jacobi"):
        raise ValueError(
            f"unknown precondition: {precondition!r} (expected 'auto' or "
            "'jacobi'); use solve_iterative for the full option surface"
        )

    st = get_bsr_structure(basis, max_b=max_b)

    # value-independent host tables for the preconditioner
    is_vector = int(getattr(basis, "n_components", 1)) >= 2
    ast = None
    agg_table = None
    g = gs = None
    if precondition == "auto":
        if is_vector:
            ast = get_affine_two_level_structure(basis, st, rbm=True)
        else:
            g = default_aggregate_size(st)
            gs = min(g, 128)
            agg_table = jnp.asarray(build_agg_block_table(st, gs))

    # constants-vs-arguments split (measured, see bench.py): bulk one-shot
    # tables and basis arrays are ARGUMENTS (compile-payload wall above ~1M
    # DOFs if closed over); the structure's remaining small descriptors stay
    # constants so XLA specializes the gathers
    big_tables = {
        "bcols": st.bcols,
        "entry_slot": st.entry_slot,
        "entry_slot_sym": st.entry_slot_sym,
        "bcols2": st.bcols2,
        "heavy_rows": st.heavy_rows,
        "tpartner": st.tpartner,
    }

    # one-time device residency: host-committed arrays passed as jit args
    # would otherwise re-ship over the tunnel on every call
    device = jax.devices()[0]
    basis_d, tables_d, agg_table_d = jax.device_put(
        (basis, big_tables, agg_table), device
    )

    n_dofs = basis.n_dofs

    @jax.jit
    def _run(Vb, tables, agg_tbl, b):
        st_d = st._replace(**tables)
        local = Vb.integrate_bilinear_form_local(bilinear_form)
        if symmetric_form:
            values = bsr_values_from_local_symmetric(st_d, local)
        else:
            values = bsr_values_from_local(st_d, local)
        if linear_form is not None:
            b = Vb.integrate_linear_form(linear_form)
        diag = bsr_diagonal(st_d, values)
        precond = None
        if precondition == "auto":
            if is_vector:
                precond = affine_two_level_from_values(
                    ast, st_d, values, diag, operand_dtype=operand_dtype
                )
            else:
                precond = agg_block_two_level_from_values(
                    st_d,
                    values,
                    diag,
                    g=g,
                    gs=gs,
                    table=agg_tbl,
                    operand_dtype=operand_dtype,
                )
        b_pad = bsr_reduce(st_d, b)
        x, info = pcg(
            lambda v: bsr_matvec(st_d, values, v),
            b_pad,
            precond_diag=diag,
            precond=precond,
            tol=tol,
            maxiter=maxiter,
        )
        u = Vb.solution_tensor() + bsr_expand(st_d, x, n_dofs)
        return u, info

    if linear_form is not None:
        dummy = jnp.zeros((n_dofs, 1), dtype=basis._coords4global_dofs.dtype)

        def solve(b=None):
            return _run(basis_d, tables_d, agg_table_d, dummy)

    else:

        def solve(b):
            return _run(basis_d, tables_d, agg_table_d, b)

    return solve
