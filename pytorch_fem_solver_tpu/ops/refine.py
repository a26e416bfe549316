"""Mixed-precision iterative refinement: f64-grade solves on an f32 chip.

The doctrine gap this closes (round-5 VERDICT item 5): f64 LU does not
compile on the axon TPU backend and the chip-native Krylov path is f32
(~1e-5 relative parity at 107k DOFs), so "passes the x64 CPU tests" has so
far implied trusting a separate f32 on-chip A/B. Classic iterative
refinement (Wilkinson; Carson & Higham's two-precision variant) recovers
f64-grade accuracy from an f32 solver:

    x_0      = solve32(b)                      (f32 two-level PCG)
    repeat:  r_k = b - A x_k   in f64          (one f64 SpMV + axpy)
             d_k = solve32(r_k)                (same f32 preconditioned PCG)
             x_{k+1} = x_k + d_k  in f64

The inner solver only ever needs ~a few digits (tol32 ~ 1e-6); each pass
multiplies the error by ~(kappa * eps_inner), so 2-3 passes reach the f64
assembly floor. Everything per-solve runs in ONE jit; the f64 operator
values and right-hand side are assembled ONCE at construction on the host
(x64 CPU backend, exactly the arrays the parity tests trust) and ride as
device-resident arguments.

On-chip cost model: the f64 SpMV's gathers are dtype-independent
(docs/performance.md: ~7-9 ns/element regardless of dtype/pattern) and the
8x8 block einsum is tiny, so a refinement pass costs ~one f32 iteration
plus the emulated-f64 multiply-accumulate overhead — measured on the real
chip in docs/performance.md (round 5).

No reference counterpart: the reference solves dense f64 on CPU
(torch_fem/basis/abstract_basis.py:177-195); this is the TPU-native way to
match that accuracy class on accelerator hardware.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RefineInfo(NamedTuple):
    """Solve evidence: inner PCG iteration count per stage (initial solve +
    one entry per refinement pass) and the TRUE f64 relative residual
    ``||b - A x|| / ||b||`` after each stage — recomputed from the f64
    operator, never the f32 recurrence."""

    inner_iterations: jnp.ndarray  # (1 + refine,)
    residuals: jnp.ndarray  # (1 + refine,) true f64 relative residuals
    converged: jnp.ndarray


def compiled_refined_solver(
    basis,
    bilinear_form: Callable,
    linear_form: Optional[Callable] = None,
    *,
    refine: int = 2,
    tol32: float = 1e-6,
    maxiter: Optional[int] = None,
    precondition: str = "auto",
    max_b: Optional[int] = None,
):
    """Build a jitted ``solve(b=None) -> (u, RefineInfo)`` whose solution
    matches the x64 CPU solve of the same discrete system to near-f64.

    Requirements: the basis must be constructed under x64 (its arrays are
    the f64 ground truth the refinement converges to), the bilinear form
    must be symmetric (canonical-pair scatter), and — unlike
    ``compiled_bsr_solver``, which re-assembles inside the program — the
    operator and (when ``linear_form`` is given) the right-hand side are
    assembled once at construction: coefficient changes require a rebuild.

    Args:
      refine: number of refinement passes (static; 2 reaches ~1e-12
        relative at 107k DOFs, see tests/test_refine.py).
      tol32: the f32 inner PCG tolerance. Much below ~1e-7 is wasted (f32
        noise floor); much above ~1e-3 needs more passes.
      precondition/max_b: as in ``compiled_bsr_solver`` (the inner solver
        is exactly its f32 two-level PCG path).
    """
    from .bsr import (
        bsr_diagonal,
        bsr_expand,
        bsr_matvec,
        bsr_reduce,
        bsr_values_from_local_symmetric,
        default_max_b,
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
            "'jacobi')"
        )
    if basis.v_grad.dtype != jnp.float64:
        raise ValueError(
            "compiled_refined_solver needs an x64 basis (its f64 assembly "
            f"is the refinement target; got {basis.v_grad.dtype}). Enable "
            "jax x64 before building the mesh/basis."
        )
    if refine < 0:
        raise ValueError(f"refine must be >= 0, got {refine}")

    if max_b is None:
        max_b = default_max_b(basis)
    st = get_bsr_structure(basis, max_b=max_b, want_entry_slot=False)

    # ---- one-time f64 host assembly (the ground truth) -------------------
    local64 = basis.integrate_bilinear_form_local(bilinear_form)
    values64_host = bsr_values_from_local_symmetric(st, local64)
    b64_host = (
        basis.integrate_linear_form(linear_form)
        if linear_form is not None
        else None
    )

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

    big_tables = {
        "bcols": st.bcols,
        "entry_slot": st.entry_slot[:0],
        "entry_slot_sym": st.entry_slot_sym,
        "bcols2": st.bcols2,
        "heavy_rows": st.heavy_rows,
        "tpartner": st.tpartner,
    }
    ast_arrays = (
        None
        if ast is None
        else {"W": ast.W, "bins1": ast.bins1, "bins2": ast.bins2}
    )
    device = jax.devices()[0]
    values64_d, b64_d, tables_d, agg_table_d, ast_d, u0_d = jax.device_put(
        (
            values64_host,
            b64_host,
            big_tables,
            agg_table,
            ast_arrays,
            basis.solution_tensor(),
        ),
        device,
    )

    n_dofs = int(basis.n_dofs)
    f32 = jnp.float32
    f64 = jnp.float64

    @jax.jit
    def _run(values64, tables, agg_tbl, ast_a, u0, b64):
        st_d = st._replace(**tables)
        values32 = jax.tree_util.tree_map(
            lambda v: v.astype(f32), values64
        )
        diag32 = bsr_diagonal(st_d, values32)
        precond = None
        if precondition == "auto":
            if is_vector:
                precond = affine_two_level_from_values(
                    ast._replace(
                        Wb=ast_a["W"].astype(f32).reshape(
                            st.nb, st.block, ast.m
                        ),
                        W=ast_a["W"].astype(f32),
                        bins1=ast_a["bins1"],
                        bins2=ast_a["bins2"],
                    ),
                    st_d,
                    values32,
                    diag32,
                )
            else:
                precond = agg_block_two_level_from_values(
                    st_d, values32, diag32, g=g, gs=gs, table=agg_tbl
                )

        def solve32(rhs32):
            return pcg(
                lambda v: bsr_matvec(st_d, values32, v),
                rhs32,
                precond_diag=diag32,
                precond=precond,
                tol=tol32,
                maxiter=maxiter,
            )

        b64_pad = bsr_reduce(st_d, b64)
        b_norm = jnp.linalg.norm(b64_pad)
        safe_b = jnp.maximum(b_norm, jnp.finfo(f64).tiny)

        x32, info0 = solve32(b64_pad.astype(f32))
        x64 = x32.astype(f64)
        iters = [info0.iterations]
        resids = [
            jnp.linalg.norm(b64_pad - bsr_matvec(st_d, values64, x64))
            / safe_b
        ]
        for _ in range(refine):
            r64 = b64_pad - bsr_matvec(st_d, values64, x64)
            d32, info_k = solve32(r64.astype(f32))
            x64 = x64 + d32.astype(f64)
            iters.append(info_k.iterations)
            resids.append(
                jnp.linalg.norm(b64_pad - bsr_matvec(st_d, values64, x64))
                / safe_b
            )

        u = u0 + bsr_expand(st_d, x64, n_dofs)
        resids_arr = jnp.stack(resids)
        info = RefineInfo(
            inner_iterations=jnp.stack(iters),
            residuals=resids_arr,
            # the refinement target: the f32 floor squared-ish; judged as
            # "reached f64-grade" when the last pass is at or below the
            # inner tolerance squared (2 passes past an honest 1e-6 inner)
            converged=resids_arr[-1] <= jnp.asarray(max(tol32**2, 1e-14)),
        )
        return u, info

    if linear_form is not None:

        def solve(b=None):
            return _run(
                values64_d, tables_d, agg_table_d, ast_d, u0_d, b64_d
            )

    else:

        def solve(b):
            if b.dtype != f64:
                raise ValueError(
                    f"refined solve needs an f64 right-hand side, got "
                    f"{b.dtype}"
                )
            return _run(values64_d, tables_d, agg_table_d, ast_d, u0_d, b)

    return solve
