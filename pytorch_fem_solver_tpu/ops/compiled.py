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

import contextlib
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _mm_precision(precision):
    """Trace-time matmul-precision scope. On TPU the f32 matmul default is
    bf16-input passes — harmless for the PCG solve (validated 1.1e-5 vs CPU
    at 107k DOFs, iterations unchanged, and 'highest' costs a measured 12%)
    but CORRUPTING for spectral paths: the f32 eigsh at 100k DOFs converged
    to eigenvalues 7.8% high under the default and to the true values (and
    in half the rounds: 12 vs 25) under 'highest'. None = backend default.
    """
    if precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(precision)

__all__ = [
    "compiled_bsr_solver",
    "compiled_eigsh_solver",
    "compiled_newton_solver",
    "compiled_stokes_solver",
]


class _CellChunkView:
    """Cell-axis slice of a basis, handed to the user's bilinear form during
    chunked assembly. Exposes exactly the array surface typical forms read
    (``v``, ``v_grad``, ``integration_points``, the element); anything else
    raises with a pointer to the unchunked path."""

    def __init__(self, v, v_grad, integration_points, dx, element):
        self.v = v
        self.v_grad = v_grad
        self.integration_points = integration_points
        self._dx = dx
        self._element = element

    def __getattr__(self, name):
        raise AttributeError(
            f"chunked assembly exposes only v / v_grad / integration_points "
            f"to the bilinear form (requested: {name!r}); pass "
            "chunk_cells=0 to compiled_bsr_solver to disable chunking"
        )


def compiled_bsr_solver(
    basis,
    bilinear_form: Callable,
    linear_form: Optional[Callable] = None,
    tol: float = 1e-10,
    maxiter: Optional[int] = None,
    precondition: str = "auto",
    symmetric_form: bool = True,
    max_b: Optional[int] = None,
    operand_dtype=None,
    chunk_cells: Optional[int] = None,
    values_dtype=None,
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
      max_b: tier-1 block cap; default None auto-picks by reference
        dimension (8 in 2D, 24 for tets — measured 26% at 1M DOFs).
      operand_dtype: reduced-precision preconditioner operands (expert knob;
        bf16 measured fragile at scale, see docs/performance.md).
      values_dtype: storage dtype for the SpMV block values (e.g.
        ``jnp.bfloat16``). The diagonal and preconditioner are built from
        the full-precision values first; only the per-iteration operator
        stream is reduced. Useful when the SpMV is HBM-bandwidth-bound
        (3D meshes: ~18 neighbor blocks/row vs ~7 in 2D); the 2D DFN
        benchmark is gather-descriptor-bound and measured no gain.
      chunk_cells: stream the symmetric stiffness scatter over cell chunks
        of this size with ``lax.scan``. The fused (T, n_loc, n_loc) local
        temp lives in a TPU-tile-padded layout (measured 32x expansion —
        a 5.9 GB temp and HBM OOM at 3.1M tets); chunking caps it at chunk
        size, with the mirror completion running once at the end. Default
        (None) auto-enables 2^18-cell chunks above 2M cells; 0 disables.
        Chunked forms may only read ``v`` / ``v_grad`` /
        ``integration_points`` from the basis they are passed.

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
        default_max_b,
        get_bsr_structure,
        inverse_inner_perm,
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

    # n_loc from the DOF map, not v_grad — a VectorBasis v_grad carries an
    # extra component axis (t, q, n_vloc, nc, d)
    n_cells = int(basis.v_grad.shape[0])
    n_loc = int(basis._global_dofs4elements.shape[-1])

    # construction-time spot check: symmetric_form=True with a
    # non-symmetric form would silently assemble a symmetrized (wrong)
    # operator — PCG converges, info looks healthy, the answer is wrong.
    # Evaluate the form eagerly on a small cell slice (host arrays, cheap)
    # and verify; the same probe records the form's output dtype for the
    # chunked scatter buffer (a form may promote, e.g. to f64).
    form_dtype = basis.v_grad.dtype
    sl = slice(0, min(64, n_cells))
    try:
        probe = np.asarray(
            (
                basis._evaluate_form(
                    bilinear_form,
                    _CellChunkView(
                        basis.v,
                        basis.v_grad[sl],
                        basis.integration_points[sl],
                        basis._dx[sl],
                        basis._element,
                    ),
                )
                * basis._dx[sl]
            ).sum(-3)
        )
    except AttributeError:
        probe = None  # form reads beyond the slice surface; cannot probe
    if probe is not None:
        form_dtype = probe.dtype
        if symmetric_form:
            asym = float(
                np.abs(probe - np.swapaxes(probe, -1, -2)).max()
            )
            scale = float(np.abs(probe).max())
            if asym > 1e-4 * max(scale, 1e-30):
                raise ValueError(
                    "symmetric_form=True but the bilinear form's local "
                    f"matrices are not symmetric (max asymmetry {asym:.2e} "
                    f"vs scale {scale:.2e}); pass symmetric_form=False"
                )

    if max_b is None:
        max_b = default_max_b(basis)  # 8 in 2D, 24 in 3D (measured)
    # symmetric assembly never touches the full per-entry scatter table —
    # skip building/shipping it (~9 s host + the largest device table at
    # 1.57M tets)
    st = get_bsr_structure(
        basis, max_b=max_b, want_entry_slot=not symmetric_form
    )

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
        # the symmetric path never reads the per-entry table; don't ship a
        # possibly-cached full one (the largest device table) for nothing
        "entry_slot": st.entry_slot[:0] if symmetric_form else st.entry_slot,
        "entry_slot_sym": st.entry_slot_sym,
        "bcols2": st.bcols2,
        "heavy_rows": st.heavy_rows,
        "tpartner": st.tpartner,
    }
    # direct-to-padded rhs scatter (flat single-index linear layouts): the
    # load-vector scatter targets pre-mapped through the inverse inner
    # permutation land straight in the padded reduced vector (Dirichlet
    # rows -> n_pad, dropped OOB), skipping the (n_dofs,) intermediate and
    # the bsr_reduce gather (~1 ms/solve at 107k DOFs, bench.py twin)
    lf_idx = basis._basis_parameters.get("linear_form_idx")
    if linear_form is not None and lf_idx is not None and len(lf_idx) == 1:
        inv = inverse_inner_perm(st, int(basis.n_dofs))
        big_tables["rhs_pad_idx"] = jnp.asarray(inv[np.asarray(lf_idx[0])])

    # chunked symmetric assembly tables (see the chunk_cells arg doc)
    if chunk_cells is not None and chunk_cells and not symmetric_form:
        raise ValueError(
            "chunk_cells requires symmetric_form=True (the streaming "
            "scatter is canonical-pair only); at >2M cells the one-shot "
            "non-symmetric local temp is known to exceed HBM "
            "(docs/performance.md)"
        )
    if chunk_cells is None:
        chunk_cells = (
            (1 << 18) if (n_cells > 2_000_000 and symmetric_form) else 0
        )
    use_chunks = bool(chunk_cells)
    chunk_xs = None
    iu, ju = np.triu_indices(n_loc)
    if use_chunks:
        C = int(chunk_cells)
        # cached per basis: padding + device push of ~0.7 GB of chunk
        # tables measured ~2 min at 6M cells over the tunnel
        cache = getattr(basis, "_chunk_tables", None)
        if cache is None:
            cache = {}
            basis._chunk_tables = cache
        chunk_xs = cache.get((C, max_b))
        if chunk_xs is None:
            pad = (-n_cells) % C
            nch = (n_cells + pad) // C

            def _padded(x):
                x = np.asarray(x)
                padded = np.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))
                return jnp.asarray(padded.reshape(nch, C, *x.shape[1:]))

            slots = np.pad(
                np.asarray(st.entry_slot_sym).reshape(n_cells, len(iu)),
                ((0, pad), (0, 0)),
                constant_values=st.n_values,  # dropped by OOB scatter mode
            )
            chunk_xs = {
                "v_grad": _padded(basis.v_grad),
                "dx": _padded(basis._dx),
                "pts": _padded(basis.integration_points),
                "slots": jnp.asarray(slots.reshape(nch, C * len(iu))),
            }
            cache[(C, max_b)] = chunk_xs

    # one-time device residency: host-committed arrays passed as jit args
    # would otherwise re-ship over the tunnel on every call. The RBM/affine
    # coarse structure also rides as an argument — its O(n) mode tables
    # would hit the remote-compile payload wall as closure constants at the
    # 1M+ DOF vector scale (the HTTP 413 class, docs/performance.md)
    # only the array fields ride as arguments; the static sizes (na, g, m)
    # stay Python ints so reshape targets inside the preconditioner setup
    # never become tracers
    # Wb is exactly W reshaped per 8-block — derive it inside the program
    # instead of doubling the shipped mode-table payload
    ast_arrays = (
        None
        if ast is None
        else {"W": ast.W, "bins1": ast.bins1, "bins2": ast.bins2}
    )
    device = jax.devices()[0]
    basis_d, tables_d, agg_table_d, ast_d, chunk_xs_d = jax.device_put(
        (basis, big_tables, agg_table, ast_arrays, chunk_xs), device
    )

    n_dofs = basis.n_dofs

    @jax.jit
    def _run(Vb, tables, agg_tbl, ast_a, chunks, b):
        st_d = st._replace(
            **{k: v for k, v in tables.items() if k != "rhs_pad_idx"}
        )
        if chunks is not None:
            from .bsr import bsr_complete_symmetric

            w = jnp.asarray(np.where(iu == ju, 0.5, 1.0), dtype=form_dtype)

            def chunk_body(vals, xs):
                view = _CellChunkView(
                    Vb.v, xs["v_grad"], xs["pts"], xs["dx"], Vb._element
                )
                local = (
                    Vb._evaluate_form(bilinear_form, view) * xs["dx"]
                ).sum(-3)
                packed = (local[..., iu, ju] * w).reshape(-1)
                return vals.at[xs["slots"]].add(packed, mode="drop"), None

            vals0 = jnp.zeros((st.n_values,), dtype=form_dtype)
            vals, _ = jax.lax.scan(chunk_body, vals0, chunks)
            values = bsr_complete_symmetric(st_d, vals)
        else:
            local = Vb.integrate_bilinear_form_local(bilinear_form)
            if symmetric_form:
                values = bsr_values_from_local_symmetric(st_d, local)
            else:
                values = bsr_values_from_local(st_d, local)
        b_direct = None
        if linear_form is not None:
            if "rhs_pad_idx" in tables:
                lv = Vb.reshape_for_assembly(
                    Vb.integrate_linear_form_local(linear_form), "linear"
                )[:, 0]
                b_direct = (
                    jnp.zeros((st.n_pad,), dtype=lv.dtype)
                    .at[tables["rhs_pad_idx"]]
                    .add(lv, mode="drop")
                )
            else:
                b = Vb.integrate_linear_form(linear_form)
        diag = bsr_diagonal(st_d, values)
        precond = None
        if precondition == "auto":
            if is_vector:
                precond = affine_two_level_from_values(
                    ast._replace(
                        Wb=ast_a["W"].reshape(st.nb, st.block, ast.m),
                        **ast_a,
                    ),
                    st_d,
                    values,
                    diag,
                    operand_dtype=operand_dtype,
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
        b_pad = b_direct if b_direct is not None else bsr_reduce(st_d, b)
        if values_dtype is not None:
            values = jax.tree_util.tree_map(
                lambda v: v.astype(values_dtype), values
            )
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
            return _run(
                basis_d, tables_d, agg_table_d, ast_d, chunk_xs_d, dummy
            )

    else:

        def solve(b):
            return _run(
                basis_d, tables_d, agg_table_d, ast_d, chunk_xs_d, b
            )

    return solve


def _bsr_setup(basis, max_b, want_agg):
    """Shared construction tail for the compiled Newton/eigsh solvers: the
    full-entry-slot BSR structure, its big-array table dict (shipped as jit
    arguments; see compiled_bsr_solver's constants-vs-arguments note) and,
    when ``want_agg``, the value-independent aggregate-block tables."""
    from .bsr import default_max_b, get_bsr_structure

    if max_b is None:
        max_b = default_max_b(basis)
    st = get_bsr_structure(basis, max_b=max_b, want_entry_slot=True)
    big_tables = {
        "bcols": st.bcols,
        "entry_slot": st.entry_slot,
        "entry_slot_sym": st.entry_slot_sym,
        "bcols2": st.bcols2,
        "heavy_rows": st.heavy_rows,
        "tpartner": st.tpartner,
    }
    g = gs = None
    agg_table = None
    if want_agg:
        from .precondition import (
            build_agg_block_table,
            default_aggregate_size,
        )

        g = default_aggregate_size(st)
        gs = min(g, 128)
        agg_table = jnp.asarray(build_agg_block_table(st, gs))
    return st, big_tables, g, gs, agg_table


def compiled_newton_solver(
    basis,
    residual_form: Callable,
    *,
    tol: float = 1e-10,
    max_newton: int = 25,
    solve_tol: float = 1e-8,
    solve_maxiter: Optional[int] = None,
    precondition: str = "jacobi",
    damping: bool = True,
    max_b: Optional[int] = None,
    matmul_precision: Optional[str] = "highest",
):
    """One-jit Newton solve for nonlinear problems F(u)[v] = 0.

    The compiled counterpart of :meth:`AbstractBasis.solve_newton`
    (same ``residual_form(basis, u, u_grad)`` contract): the ENTIRE Newton
    iteration — per-step residual assembly, ``jax.jvp`` consistent-Jacobian
    columns, BSR value scatter, preconditioner setup, the BiCGStab update
    solve and the backtracking damping — runs as a single
    ``lax.while_loop`` XLA program, so a solve costs one dispatch instead
    of ~(ops per Newton step) x ~31 ms tunnel RTT per step.

    Args:
      precondition: ``"jacobi"`` (robust default for the non-symmetric
        linearization) or ``"auto"`` (aggregate-block two-level built from
        each step's Jacobian values — worthwhile for diffusion-dominated
        problems whose linearizations stay near-symmetric).
      damping: backtrack (halve, up to 12x) while the reduced residual
        norm does not decrease.

    Returns ``solve(u0=None, *args) -> (u, (iterations, residual_norm,
    converged))``; ``u0`` seeds non-homogeneous Dirichlet values and
    ``args`` are forwarded to ``residual_form(basis, u, u_grad, *args)``
    — both ride as jit arguments, so re-solving with different seeds,
    right-hand-side data or time-stepping state (e.g. the previous step
    interpolated at quadrature points) reuses the compiled program. No
    reference counterpart (the reference has no nonlinear solver; dense
    LU only, torch_fem/basis/abstract_basis.py:177-195).
    """
    from .bsr import (
        bsr_diagonal,
        bsr_expand,
        bsr_matvec,
        bsr_reduce,
        bsr_values_from_local,
    )
    from .precondition import (
        affine_two_level_from_values,
        agg_block_two_level_from_values,
        get_affine_two_level_structure,
    )
    from .solvers import bicgstab

    if precondition not in ("auto", "jacobi"):
        raise ValueError(
            f"unknown precondition: {precondition!r} "
            "(expected 'auto' or 'jacobi')"
        )
    is_vector = int(getattr(basis, "n_components", 1)) >= 2

    st, big_tables, g, gs, agg_table = _bsr_setup(
        basis, max_b, want_agg=precondition == "auto" and not is_vector
    )
    # vector bases: rigid-body-mode coarse space. The STRUCTURE (mode
    # tables W, aggregate bins) is value-independent and built once on the
    # host; the numeric setup from each Newton step's Jacobian values runs
    # inside the while_loop body (measured on 3D elasticity: Jacobi pays 6x
    # the iterations of the RBM coarse, docs/performance.md).
    ast = None
    if precondition == "auto" and is_vector:
        ast = get_affine_two_level_structure(basis, st, rbm=True)
    ast_arrays = (
        None
        if ast is None
        else {"W": ast.W, "bins1": ast.bins1, "bins2": ast.bins2}
    )
    device = jax.devices()[0]
    basis_d, tables_d, agg_table_d, ast_d = jax.device_put(
        (basis, big_tables, agg_table, ast_arrays), device
    )

    n_loc = int(basis._global_dofs4elements.shape[-1])
    n_dofs = basis.n_dofs

    def _residual_local(Vb, u_cells, form_args):
        uh, ugh = Vb._iterate_at_quadrature(u_cells)
        integrand = Vb._evaluate_form(residual_form, Vb, uh, ugh, *form_args)
        return (integrand * Vb._dx).sum(-3)

    @jax.jit
    def _run(Vb, tables, agg_tbl, ast_a, u0, form_args):
        st_d = st._replace(**tables)
        dofs = Vb._global_dofs4elements

        def res_norm(u):
            r = Vb._assemble_linear_from_local(
                _residual_local(Vb, u[..., 0][..., dofs], form_args)
            )
            return jnp.linalg.norm(Vb.reduce(r)), r

        res0, _ = res_norm(u0)
        target = tol * jnp.maximum(1.0, res0)

        def cond(state):
            _, res, k = state
            return jnp.logical_and(res > target, k < max_newton)

        def body(state):
            u, res, k = state
            u_cells = u[..., 0][..., dofs]
            r = Vb._assemble_linear_from_local(
                _residual_local(Vb, u_cells, form_args)
            )
            cols = []
            for j in range(n_loc):
                tangent = jnp.zeros_like(u_cells).at[..., j].set(1.0)
                _, col = jax.jvp(
                    lambda c: _residual_local(Vb, c, form_args),
                    (u_cells,),
                    (tangent,),
                )
                cols.append(col)
            j_local = jnp.concatenate(cols, axis=-1)
            values = bsr_values_from_local(st_d, j_local)
            diag = bsr_diagonal(st_d, values)
            precond = None
            if precondition == "auto":
                if is_vector:
                    precond = affine_two_level_from_values(
                        ast._replace(
                            Wb=ast_a["W"].reshape(st.nb, st.block, ast.m),
                            **ast_a,
                        ),
                        st_d,
                        values,
                        diag,
                    )
                else:
                    precond = agg_block_two_level_from_values(
                        st_d, values, diag, g=g, gs=gs, table=agg_tbl
                    )
            x, _ = bicgstab(
                lambda v: bsr_matvec(st_d, values, v),
                bsr_reduce(st_d, -r),
                precond_diag=diag,
                precond=precond,
                tol=solve_tol,
                maxiter=solve_maxiter,
            )
            delta = bsr_expand(st_d, x, n_dofs)

            def try_norm(s):
                rn, _ = res_norm(u + s * delta)
                return rn

            rn1 = try_norm(1.0)
            if damping:

                def damp_cond(c):
                    _, rn, t = c
                    # NOT (rn < res), not (rn >= res): a NaN trial norm
                    # (diverged inner solve in f32 — observed on the TPU
                    # with Jacobi-BiCGStab at 100k DOFs) must keep damping,
                    # not be accepted
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
            # a still-non-finite trial norm after damping must not poison
            # the iterate (keep u, stop); likewise a fully backtracked step
            # that STILL does not decrease the residual is a stalled line
            # search (the f32 assembly noise floor on TPU) — burning the
            # remaining Newton budget on it cannot help, so stop there too
            # and let converged=False report the stall honestly
            bad = jnp.logical_not(jnp.isfinite(rn))
            if damping:
                bad = jnp.logical_or(bad, rn >= res)
            u_next = jnp.where(bad, u, u + s * delta)
            rn = jnp.where(bad, res, rn)
            k_next = jnp.where(bad, max_newton, k + 1)
            return (u_next, rn, k_next)

        u, res, k = jax.lax.while_loop(cond, body, (u0, res0, 0))
        return u, (k, res, res <= target)

    def solve(u0=None, *args):
        if u0 is None:
            u0 = basis.solution_tensor()
        with _mm_precision(matmul_precision):
            return _run(
                basis_d, tables_d, agg_table_d, ast_d, u0, tuple(args)
            )

    return solve


def compiled_eigsh_solver(
    basis,
    a_form: Callable,
    m_form: Callable,
    k: int = 6,
    *,
    tol: float = 1e-9,
    max_rounds: int = 60,
    solve_tol: float = 1e-10,
    solve_maxiter: Optional[int] = None,
    precondition: str = "two_level",
    max_b: Optional[int] = None,
    seed: int = 0,
    matmul_precision: Optional[str] = "highest",
    method: str = "lobpcg",
    lock_tol: Optional[float] = None,
):
    """One-jit generalized eigensolve: compiled counterpart of
    :meth:`AbstractBasis.solve_eigsh`.

    Assembly of both forms, preconditioner setup and the whole iteration
    run as a single XLA program; a solve costs one dispatch instead of
    ~2 x rounds. ``method="lobpcg"`` (default;
    ``ops.eigen.lobpcg_eigsh``) costs one A-matvec, one M-matvec and ONE
    preconditioner application per round (``solve_tol``/``solve_maxiter``
    are unused); ``"subspace"`` is shift-invert subspace iteration
    (``ops.eigen.subspace_eigsh_while`` — vmapped full inner PCG A-solves
    inside a ``lax.while_loop`` of Rayleigh-Ritz rounds). The round-3
    LOBPCG was x64-only (its Gram-basis Rayleigh-Ritz lost
    B-orthogonality in f32 and returned garbage); the blockwise
    M-orthonormalization + soft-locking rewrite fixed that, and the
    on-chip A/B (f32, 100k DOFs, 2026-08-19, tools/exp_solver_tier.py)
    now measures LOBPCG at 0.463 s / 27 rounds vs subspace's 2.078 s /
    12 rounds for the same spectrum (19.7380 vs 19.7379, ...), a 4.5x
    win — hence the default flip. Both stop on relative
    eigenvalue change <= ``tol``.
    Returns ``solve() -> (vals (k,), vecs (n_dofs, k), (rounds,
    eig_change, converged))``. No reference counterpart (the reference has
    no eigen capability).
    """
    from .bsr import (
        bsr_diagonal,
        bsr_expand,
        bsr_matvec,
        bsr_reduce,
        bsr_values_from_local,
    )
    from .eigen import lobpcg_eigsh, subspace_eigsh_while

    if precondition not in ("two_level", "jacobi"):
        raise ValueError(
            f"unknown precondition: {precondition!r} "
            "(expected 'two_level' or 'jacobi')"
        )
    if method not in ("lobpcg", "subspace"):
        raise ValueError(
            f"unknown method: {method!r} (expected 'lobpcg' or 'subspace')"
        )
    is_vector = int(getattr(basis, "n_components", 1)) >= 2
    n_inner = int(np.asarray(basis._basis_parameters["inner_dofs"]).size)
    if k > n_inner:
        raise ValueError(
            f"requested k={k} eigenpairs from an n={n_inner} system"
        )
    m_block = min(k + max(2, k // 2), n_inner)

    # value-independent preconditioner tables stay on host (the numeric
    # setup from the assembled values runs inside the program)
    st, big_tables, g, gs, agg_table = _bsr_setup(
        basis, max_b, want_agg=precondition == "two_level" and not is_vector
    )
    # vector bases (elasticity eigenmodes): rigid-body-mode coarse space —
    # structure host-built once, numeric setup inside the program (same
    # threading as compiled_bsr_solver; measured 6x iteration cut vs Jacobi
    # on 3D elasticity, docs/performance.md)
    ast = None
    if precondition == "two_level" and is_vector:
        from .precondition import get_affine_two_level_structure

        ast = get_affine_two_level_structure(basis, st, rbm=True)
    ast_arrays = (
        None
        if ast is None
        else {"W": ast.W, "bins1": ast.bins1, "bins2": ast.bins2}
    )

    rng = np.random.default_rng(seed)
    rand = jnp.asarray(
        rng.standard_normal((basis.n_dofs, m_block)),
        dtype=basis._coords4global_dofs.dtype,
    )
    device = jax.devices()[0]
    basis_d, tables_d, agg_table_d, ast_d, rand_d = jax.device_put(
        (basis, big_tables, agg_table, ast_arrays, rand), device
    )
    n_dofs = basis.n_dofs

    @jax.jit
    def _run(Vb, tables, agg_tbl, ast_a, rblock):
        st_d = st._replace(**tables)
        va = bsr_values_from_local(
            st_d, Vb.integrate_bilinear_form_local(a_form)
        )
        vm = bsr_values_from_local(
            st_d, Vb.integrate_bilinear_form_local(m_form)
        )
        diag = bsr_diagonal(st_d, va)
        precond = None
        if precondition == "two_level":
            if is_vector:
                from .precondition import affine_two_level_from_values

                precond = affine_two_level_from_values(
                    ast._replace(
                        Wb=ast_a["W"].reshape(st.nb, st.block, ast.m),
                        **ast_a,
                    ),
                    st_d,
                    va,
                    diag,
                )
            else:
                from .precondition import agg_block_two_level_from_values

                precond = agg_block_two_level_from_values(
                    st_d, va, diag, g=g, gs=gs, table=agg_tbl
                )
        x0 = jnp.stack(
            [bsr_reduce(st_d, rblock[:, j]) for j in range(m_block)], axis=1
        )
        if method == "lobpcg":
            vals, vecs_pad, info = lobpcg_eigsh(
                lambda v: bsr_matvec(st_d, va, v),
                lambda v: bsr_matvec(st_d, vm, v),
                x0,
                k,
                tol=tol,
                max_rounds=max(max_rounds, 200),
                precond=precond,
                precond_diag=None if precond is not None else diag,
                lock_tol=lock_tol,
            )
        else:
            vals, vecs_pad, info = subspace_eigsh_while(
                lambda v: bsr_matvec(st_d, va, v),
                lambda v: bsr_matvec(st_d, vm, v),
                x0,
                k,
                tol=tol,
                max_rounds=max_rounds,
                solve_tol=solve_tol,
                solve_maxiter=solve_maxiter,
                precond=precond,
                precond_diag=None if precond is not None else diag,
            )
        vecs = jnp.stack(
            [
                bsr_expand(st_d, vecs_pad[:, j], n_dofs)[..., 0]
                for j in range(k)
            ],
            axis=1,
        )
        return vals, vecs, info

    def solve():
        with _mm_precision(matmul_precision):
            return _run(basis_d, tables_d, agg_table_d, ast_d, rand_d)

    return solve


def compiled_stokes_solver(
    velocity_basis,
    pressure_basis,
    a_form: Callable,
    b_form: Callable,
    *,
    tol: float = 1e-8,
    maxiter: Optional[int] = None,
    inner_tol: float = 1e-11,
    inner_maxiter: Optional[int] = None,
    precondition: str = "auto",
    mass_form: Optional[Callable] = None,
    max_b: Optional[int] = None,
    operand_dtype=None,
    matmul_precision: Optional[str] = "highest",
    method: str = "schur",
    minres_restart: Optional[int] = 50,
    inner_eta: float = 0.1,
    inner_tol_max: float = 1e-2,
    f_solve_tol: Optional[float] = None,
    recovery_tol: Optional[float] = None,
    inner_iters: Optional[int] = None,
    a_scalar_form: Optional[Callable] = None,
):
    """One-jit Stokes solve: the compiled counterpart of
    :func:`ops.saddle.stokes_solver` (same math, same contracts).

    The eager solver dispatches every inner A-solve op-by-op — on the
    tunneled TPU that is ~31 ms RTT per op times hundreds of inner PCG
    iterations per Schur application (the measured 90x eager/compiled gap,
    docs/performance.md). Here the ENTIRE solve — both local assemblies,
    BSR value scatter, preconditioner numeric setup and the Krylov loop —
    is a single XLA program; a solve costs one dispatch. ``f`` (and
    optional ``g``, ``x0``) ride as jit arguments, so re-solving with new
    right-hand sides reuses the compiled program.

    Args:
      method: ``"schur"`` (default) is the nested Schur-complement CG of
        the eager solver (``lax.while_loop`` inside ``lax.while_loop``),
        with ``tol`` on the lumped-M_p-preconditioned Schur residual.
        Unlike the eager solver, the outer loop is a FLEXIBLE CG whose
        inner A-solves are warm-started (optimally scaled previous inner
        solution) and run at a RELAXED tolerance
        ``clip(inner_eta * tol * ||r_0|| / ||r_k||, inner_tol,
        inner_tol_max)`` (van den Eshof & Sleijpen inexact-Krylov
        relaxation; ``inner_eta=0`` pins every inner solve at
        ``inner_tol``). The fixed-tolerance version measured 2.04 s / 17
        outer iterations at 107k velocity DOFs on the real chip (f32,
        2026-08-19, tools/exp_solver_tier.py); see docs/performance.md
        for the relaxed-path A/B.
        ``"minres"`` solves the full symmetric-indefinite saddle system
        with block-diagonally preconditioned MINRES — one A-block
        preconditioner application per iteration instead of a full inner
        A-solve per Schur application; ``tol`` is then the relative
        full-system residual in the preconditioned norm, and
        ``inner_tol``/``inner_maxiter`` only govern the one final
        velocity recovery solve. MINRES is x64-accurate (parity 4e-12 vs
        the eager solver in tests) and, since the round-4
        ``minres_restart`` true-residual replacement, its f32 stopping
        test is honest — but it stays uncompetitive on chip: 3.69 s /
        416 iterations vs schur's 1.47 s / 17 outer at 107k velocity
        DOFs, and at equal ``tol`` the full-system residual norm admits
        pressure error that the A^{-1} B^T recovery amplifies into much
        larger velocity error (2026-08-19 A/B, docs/performance.md) —
        keep ``"schur"`` on TPU.
      precondition: A-block preconditioner — ``"auto"`` (aggregate-block
        two-level for scalar bases; rigid-body-mode coarse space for
        vector bases, the compiled_bsr_solver defaults) or ``"jacobi"``.
      inner_maxiter: cap for the nested/recovery A-solves (default: PCG's
        10n bound; set ~a few hundred to bound the worst case).
      f_solve_tol: tolerance for the ONE initial f-solve (schur method
        only; default ``inner_tol``). Its relative error enters the Schur
        rhs directly, so ~``tol`` suffices — the tight default is
        conservative; the final velocity recovery still runs at
        ``recovery_tol``.
      recovery_tol: tolerance for the ONE final velocity recovery solve
        (default ``inner_tol``). Relative to ``||f - B^T p||`` — on
        pressure-dominated problems that norm is far below ``||f||``, so
        the default is effectively absolute-tight; ~``tol`` matches the
        velocity error already admitted by the outer Schur tolerance.
      inner_iters: when set, every SCHUR-APPLY inner A-solve runs a FIXED
        ``inner_iters`` preconditioned-CG iterations instead of solving to
        a tolerance (inexact-Uzawa economics under the flexible outer CG;
        the initial f-solve and the final velocity recovery keep their
        tolerances). The tolerance schedule (``inner_eta``/``inner_tol``/
        ``inner_tol_max``) is then unused by the applies. MEASURED
        FAST-BUT-WRONG at production tolerances (2026-08-20 on-chip A/B,
        107k velocity DOFs, tol=1e-5): K=8/12/16 ran 0.64-0.66 s but the
        outer recurrence "converged" while the TRUE velocity error vs the
        x64 truth was 0.15/0.06/0.03 relative — three orders off the
        relaxed schedule's 7e-5. Constant apply error floors the
        attainable true residual (the vdE-S bound needs the error SMALL
        where alpha is large); use the default schedule unless the quality
        target is genuinely ~1e-2. The stall guards in schur_flexible_cg
        keep this mode finite, not accurate.
      a_scalar_form: declares the viscous block COMPONENT-DECOUPLED: the
        scalar bilinear form whose operator, applied per velocity
        component, equals ``a_form`` (true for the full-gradient
        contraction ``einsum('...icd,...jcd->...ij', grad, grad)`` with
        scalar twin ``v_grad @ v_grad^T``; NOT true for symmetric-gradient
        /strain forms, which couple components). When given (schur method
        only), every inner A-solve runs on the SCALAR operator with the
        ``n_components`` component vectors as simultaneous right-hand
        sides (``ops.bsr.bsr_matvec_cols`` + ``ops.solvers.pcg_cols``):
        half the streamed operator values (the interleaved vector BSR
        stores zero cross-component entries), per-component gather cost
        cut ``n_components``-fold (descriptor-charged row gathers carry
        all components), and the scalar aggregate-block two-level
        preconditioner (measurably stronger than the vector RBM path on
        decoupled blocks). The caller owns the decoupling claim — it is
        not checked against ``a_form`` (which is then unused).

    Returns ``solve(f, g=None, x0=None) -> (u, p, StokesInfo)``; the
    pressure has zero lumped-mass mean. No reference counterpart (the
    reference has neither mixed elements nor iterative solvers — dense LU
    only, torch_fem/basis/abstract_basis.py:177-195).
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
    from .saddle import StokesInfo, schur_flexible_cg
    from .solvers import minres, pcg

    if precondition not in ("auto", "jacobi", "agg_rbm", "agg_comp"):
        raise ValueError(
            f"unknown precondition: {precondition!r} "
            "(expected 'auto', 'agg_rbm', 'agg_comp' or 'jacobi')"
        )
    if method not in ("minres", "schur"):
        raise ValueError(
            f"unknown method: {method!r} (expected 'minres' or 'schur')"
        )
    if a_scalar_form is not None:
        if method != "schur":
            raise ValueError("a_scalar_form requires method='schur'")
        return _compiled_stokes_scalar_a(
            velocity_basis,
            pressure_basis,
            a_scalar_form,
            b_form,
            tol=tol,
            maxiter=maxiter,
            inner_tol=inner_tol,
            inner_maxiter=inner_maxiter,
            precondition=precondition,
            mass_form=mass_form,
            max_b=max_b,
            operand_dtype=operand_dtype,
            matmul_precision=matmul_precision,
            inner_eta=inner_eta,
            inner_tol_max=inner_tol_max,
            f_solve_tol=f_solve_tol,
            recovery_tol=recovery_tol,
            inner_iters=inner_iters,
        )
    Vu, Vp = velocity_basis, pressure_basis
    if mass_form is None:
        mass_form = lambda b_: b_.v @ jnp.matrix_transpose(b_.v)

    if max_b is None:
        max_b = default_max_b(Vu)
    st = get_bsr_structure(Vu, max_b=max_b, want_entry_slot=False)

    is_vector = int(getattr(Vu, "n_components", 1)) >= 2
    ast = None
    agg_table = None
    g_agg = gs = None
    if precondition in ("auto", "agg_rbm", "agg_comp"):
        if is_vector:
            ast = get_affine_two_level_structure(
                Vu,
                st,
                # component-indicator modes: the decoupled-block coarse
                # space — m = nc instead of the RBM set, so the same
                # MAX_COARSE cap admits ~2x more aggregates (finer coarse
                # level per component; see get_affine_two_level_structure)
                mode_kind=(
                    "components" if precondition == "agg_comp" else "rbm"
                ),
            )
            if precondition in ("agg_rbm", "agg_comp"):
                # aggregate-block smoother: the 8x8 block-Jacobi fine
                # smoother converges at only ~0.89/iter on the P2 vector
                # Laplacian (ops/precondition.py,
                # affine_two_level_from_values docstring). For agg_comp
                # the smoother aggregate follows the (smaller) coarse
                # aggregate of the component space.
                gs = (
                    min(ast.W.shape[1], 128)
                    if precondition == "agg_comp"
                    else min(default_aggregate_size(st), 128)
                )
                agg_table = jnp.asarray(build_agg_block_table(st, gs))
        else:
            g_agg = default_aggregate_size(st)
            gs = min(g_agg, 128)
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
    # the mixed coupling block is geometry-only (the forms see basis tables,
    # not solution state): assemble the unassembled element matrices once at
    # construction, on the host-committed arrays, and ship them as device
    # arguments — this also sidesteps the mesh-identity validation, which
    # cannot hold between pytree-reconstructed jit operands
    local_b_host = Vp.integrate_mixed_bilinear_form_local(Vu, b_form)
    mp_lumped_host = Vp._assemble_linear_from_local(
        Vp.integrate_bilinear_form_local(mass_form).sum(-1, keepdims=True)
    )
    device = jax.devices()[0]
    Vu_d, Vp_d, tables_d, agg_table_d, ast_d, local_b_d, mp_d = (
        jax.device_put(
            (Vu, Vp, big_tables, agg_table, ast_arrays, local_b_host,
             mp_lumped_host),
            device,
        )
    )

    n_u = Vu.n_dofs

    @jax.jit
    def _run(Vub, Vpb, tables, agg_tbl, ast_a, local_b, mp_lumped, f, g, x0):
        st_d = st._replace(**tables)
        local_a = Vub.integrate_bilinear_form_local(a_form)
        values = bsr_values_from_local_symmetric(st_d, local_a)
        diag = bsr_diagonal(st_d, values)
        precond = None
        if precondition in ("auto", "agg_rbm", "agg_comp"):
            if is_vector:
                precond = affine_two_level_from_values(
                    ast._replace(
                        Wb=ast_a["W"].reshape(st.nb, st.block, ast.m),
                        **ast_a,
                    ),
                    st_d,
                    values,
                    diag,
                    operand_dtype=operand_dtype,
                    fine=(
                        "agg_block"
                        if precondition in ("agg_rbm", "agg_comp")
                        else "block_jacobi"
                    ),
                    gs=gs,
                    agg_table=agg_tbl,
                )
            else:
                precond = agg_block_two_level_from_values(
                    st_d, values, diag, g=g_agg, gs=gs, table=agg_tbl,
                    operand_dtype=operand_dtype,
                )

        local_bt = jnp.matrix_transpose(local_b)
        mp_total = mp_lumped.sum()
        u_dofs = Vub._global_dofs4elements
        p_dofs = Vpb._global_dofs4elements

        def apply_b(u_vec):
            u_cells = u_vec[..., 0][u_dofs][..., None]
            return Vpb._assemble_linear_from_local(local_b @ u_cells)

        def apply_bt(p_vec):
            p_cells = p_vec[..., 0][p_dofs][..., None]
            return Vub._assemble_linear_from_local(local_bt @ p_cells)

        def project_mean(p_vec):
            mean = (mp_lumped * p_vec).sum() / mp_total
            return p_vec - mean

        def solve_a(rhs):
            x, info = pcg(
                lambda v: bsr_matvec(st_d, values, v),
                bsr_reduce(st_d, rhs),
                precond_diag=diag,
                precond=precond,
                tol=inner_tol,
                maxiter=inner_maxiter,
            )
            return bsr_expand(st_d, x, n_u), info

        inv_lump = 1.0 / mp_lumped[:, 0]

        if method == "minres":
            # full saddle system, block-diagonal preconditioner: ONE
            # A-preconditioner application per iteration (vs one full inner
            # A-solve per Schur matvec). Velocity block rides in the
            # reduced/padded BSR layout so bsr_reduce/bsr_expand (exact
            # adjoints: perm-gather / perm-scatter) keep K symmetric.
            nr = st.n_pad
            safe_diag = jnp.where(diag != 0, diag, 1.0)
            precond_u = precond if precond is not None else (
                lambda r: r / safe_diag
            )

            def k_op(xall):
                xu, xp = xall[:nr], xall[nr:]
                yu = bsr_matvec(st_d, values, xu) + bsr_reduce(
                    st_d, apply_bt(xp[:, None])
                )
                yp = apply_b(bsr_expand(st_d, xu, n_u))[:, 0]
                return jnp.concatenate([yu, yp])

            def p_op(rall):
                ru, rp = rall[:nr], rall[nr:]
                # pressure block: mean-projected lumped-mass inverse,
                # Pi M_p^{-1} = M_p^{-1} - 1 1^T / (1^T M_p 1) — symmetric
                # PSD with nullspace M_p·1, orthogonal to the residuals
                # (discrete div integrates to 0 against the constant)
                zp = inv_lump * rp - jnp.sum(rp) / mp_total
                return jnp.concatenate([precond_u(ru), zp])

            rhs = jnp.concatenate([bsr_reduce(st_d, f), g[:, 0]])
            x0_all = jnp.concatenate(
                [jnp.zeros((nr,), dtype=rhs.dtype), x0]
            )
            xall, mr_info = minres(
                k_op, rhs, x0=x0_all, precond=p_op, tol=tol,
                maxiter=maxiter, restart=minres_restart,
            )
            p = project_mean(xall[nr:][:, None])
            # velocity recovery at inner_tol: MINRES balances the u/p
            # residual blocks in the preconditioned norm; the final A-solve
            # restores a velocity consistent with p to solver precision
            u, info_u = solve_a(f - apply_bt(p))
            info = StokesInfo(
                outer_iterations=mr_info.iterations,
                schur_residual=mr_info.residual_norm,
                converged=mr_info.converged,
                inner_info=info_u,
            )
            return u, p, info

        def solve_a_reduced(rhs_reduced, x0_red, tol_inner):
            """Inner A-solve in the reduced/padded layout with an explicit
            starting guess and a (possibly traced) relative tolerance."""
            return pcg(
                lambda v: bsr_matvec(st_d, values, v),
                rhs_reduced,
                x0=x0_red,
                precond_diag=diag,
                precond=precond,
                tol=tol_inner,
                maxiter=inner_maxiter,
            )

        if inner_iters is None:
            solve_a_schur = solve_a_reduced
        else:
            # fixed-iteration inexact applies: tol=0 never triggers the
            # residual test (except on an exactly-zero rhs, where PCG
            # exits after 0 iterations), so each apply runs exactly
            # inner_iters preconditioned-CG steps
            def solve_a_schur(rhs_reduced, x0_red, tol_inner):
                return pcg(
                    lambda v: bsr_matvec(st_d, values, v),
                    rhs_reduced,
                    x0=x0_red,
                    precond_diag=diag,
                    precond=precond,
                    tol=0.0,
                    maxiter=inner_iters,
                )

        u_f_red, info_f = solve_a_reduced(
            bsr_reduce(st_d, f),
            jnp.zeros((st.n_pad,), dtype=f.dtype),
            f_solve_tol if f_solve_tol is not None else inner_tol,
        )
        u_f = bsr_expand(st_d, u_f_red, n_u)
        rhs_p = apply_b(u_f)
        rhs_p = rhs_p - g
        rhs_p = project_mean(rhs_p)

        precond_p = lambda r: project_mean((inv_lump * r)[:, None])[:, 0]

        # Flexible outer CG with warm-started, tolerance-relaxed inner
        # A-solves — the one implementation shared with the row-sharded
        # twin lives in ops/saddle.py (schur_flexible_cg); see its
        # docstring for the warm-start/relaxed-tolerance derivation and
        # the measured 2.04 s -> sub-second cut it bought on chip.
        outer_cap = maxiter if maxiter is not None else 10 * Vp.n_dofs
        p_flat, res_fin, k_out, atol, inner_schur, u_bt = schur_flexible_cg(
            rhs_p[:, 0],
            x0,
            apply_bt_w=lambda d: bsr_reduce(st_d, apply_bt(d[:, None])),
            solve_a=solve_a_schur,
            schur_out=lambda y: project_mean(
                apply_b(bsr_expand(st_d, y, n_u))
            )[:, 0],
            precond_p=precond_p,
            dot_w=lambda a, b: jnp.sum(a * b),
            zeros_red=jnp.zeros((st.n_pad,), dtype=f.dtype),
            tol=tol,
            inner_tol=inner_tol,
            inner_eta=inner_eta,
            inner_tol_max=inner_tol_max,
            outer_cap=outer_cap,
        )
        p = project_mean(p_flat[:, None])
        # velocity recovery warm-started from the outer CG's free velocity
        # by-product u_f - u_bt ~ A^{-1}(f - B^T p) (schur_flexible_cg
        # docstring) — the solve only has to polish the alpha-weighted
        # inner-solve errors down to recovery_tol
        u_red, info_u = solve_a_reduced(
            bsr_reduce(st_d, f - apply_bt(p)),
            u_f_red - u_bt,
            recovery_tol if recovery_tol is not None else inner_tol,
        )
        u = bsr_expand(st_d, u_red, n_u)
        info = StokesInfo(
            outer_iterations=k_out,
            schur_residual=res_fin,
            converged=res_fin <= atol,
            inner_info=info_u,
            inner_total=info_f.iterations + inner_schur + info_u.iterations,
        )
        return u, p, info

    n_p = Vp.n_dofs
    f_dtype = Vu._coords4global_dofs.dtype
    zero_g = jnp.zeros((n_p, 1), dtype=f_dtype)
    zero_x0 = jnp.zeros((n_p,), dtype=f_dtype)

    def solve(f, g=None, x0=None):
        with _mm_precision(matmul_precision):
            return _run(
                Vu_d,
                Vp_d,
                tables_d,
                agg_table_d,
                ast_d,
                local_b_d,
                mp_d,
                f,
                zero_g if g is None else g,
                zero_x0 if x0 is None else x0[:, 0],
            )

    return solve


def _compiled_stokes_scalar_a(
    Vu,
    Vp,
    a_scalar_form: Callable,
    b_form: Callable,
    *,
    tol: float,
    maxiter: Optional[int],
    inner_tol: float,
    inner_maxiter: Optional[int],
    precondition: str,
    mass_form: Optional[Callable],
    max_b: Optional[int],
    operand_dtype,
    matmul_precision: Optional[str],
    inner_eta: float,
    inner_tol_max: float,
    f_solve_tol: Optional[float],
    recovery_tol: Optional[float],
    inner_iters: Optional[int],
):
    """Component-decoupled Stokes schur solve (``a_scalar_form`` path).

    The A block is ``blkdiag(A_s, ..., A_s)`` with A_s the scalar operator
    of ``a_scalar_form`` on the companion scalar basis; every inner solve
    runs ``pcg_cols`` on A_s with the ``nc`` component columns as
    simultaneous right-hand sides. Interleaved vector DOF layout
    ((node i, comp c) -> i*nc + c, ``basis.VectorBasis``) makes the
    vector<->columns mapping a reshape. See ``compiled_stokes_solver``'s
    ``a_scalar_form`` docs for the measured economics.
    """
    from ..basis.basis import Basis
    from .bsr import (
        bsr_diagonal,
        bsr_expand_cols,
        bsr_matvec_cols,
        bsr_reduce_cols,
        bsr_values_from_local_symmetric,
        default_max_b,
        get_bsr_structure,
    )
    from .precondition import (
        agg_block_two_level_from_values,
        build_agg_block_table,
        default_aggregate_size,
    )
    from .saddle import StokesInfo, schur_flexible_cg
    from .solvers import pcg_cols

    nc = int(getattr(Vu, "n_components", 1))
    if nc < 2:
        raise ValueError("a_scalar_form requires a vector velocity basis")
    if getattr(Vu, "_dirichlet_components", None) is not None:
        raise ValueError(
            "a_scalar_form requires all components Dirichlet-clamped "
            "together (dirichlet_components=None): per-component "
            "constraints break the shared scalar reduction"
        )
    if mass_form is None:
        mass_form = lambda b_: b_.v @ jnp.matrix_transpose(b_.v)

    Vs = Basis(Vu.mesh, Vu._element)
    n_s, n_u, n_p = int(Vs.n_dofs), int(Vu.n_dofs), int(Vp.n_dofs)
    if n_s * nc != n_u:
        raise ValueError(
            f"scalar companion basis has {n_s} DOFs but the vector basis "
            f"has {n_u} != {nc} * {n_s} — non-interleaved layout?"
        )
    if max_b is None:
        max_b = default_max_b(Vs)
    st = get_bsr_structure(Vs, max_b=max_b, want_entry_slot=False)

    g_agg = gs = None
    agg_table = None
    if precondition != "jacobi":
        g_agg = default_aggregate_size(st)
        gs = min(g_agg, 128)
        agg_table = jnp.asarray(build_agg_block_table(st, gs))

    big_tables = {
        "bcols": st.bcols,
        "entry_slot": st.entry_slot[:0],
        "entry_slot_sym": st.entry_slot_sym,
        "bcols2": st.bcols2,
        "heavy_rows": st.heavy_rows,
        "tpartner": st.tpartner,
    }
    local_b_host = Vp.integrate_mixed_bilinear_form_local(Vu, b_form)
    mp_lumped_host = Vp._assemble_linear_from_local(
        Vp.integrate_bilinear_form_local(mass_form).sum(-1, keepdims=True)
    )
    device = jax.devices()[0]
    # the vector DOF table rides as a jit ARGUMENT (like the BSR tables):
    # as a closure constant it would re-upload with the program and push
    # the axon remote-compile payload toward the HTTP-413 wall at scale
    (Vs_d, Vp_d, tables_d, agg_table_d, local_b_d, mp_d, u_dofs_d) = (
        jax.device_put(
            (
                Vs,
                Vp,
                big_tables,
                agg_table,
                local_b_host,
                mp_lumped_host,
                np.asarray(Vu._global_dofs4elements),
            ),
            device,
        )
    )

    @jax.jit
    def _run(Vsb, Vpb, tables, agg_tbl, local_b, mp_lumped, u_dofs_t,
             f, g, x0):
        st_d = st._replace(**tables)
        local_a = Vsb.integrate_bilinear_form_local(a_scalar_form)
        values = bsr_values_from_local_symmetric(st_d, local_a)
        diag = bsr_diagonal(st_d, values)
        if precondition != "jacobi":
            precond1 = agg_block_two_level_from_values(
                st_d, values, diag, g=g_agg, gs=gs, table=agg_tbl,
                operand_dtype=operand_dtype,
            )
            precond_cols = jax.vmap(precond1, in_axes=1, out_axes=1)
        else:
            safe = jnp.where(diag != 0, diag, 1.0)
            inv_diag = 1.0 / safe
            precond_cols = lambda R: inv_diag[:, None] * R

        local_bt = jnp.matrix_transpose(local_b)
        mp_total = mp_lumped.sum()
        inv_lump = 1.0 / mp_lumped[:, 0]

        def apply_b(u_vec):
            u_cells = u_vec[..., 0][u_dofs_t][..., None]
            return Vpb._assemble_linear_from_local(local_b @ u_cells)

        def apply_bt(p_vec):
            p_cells = p_vec[..., 0][Vpb._global_dofs4elements][..., None]
            # scatter into the full vector layout via the pressure basis's
            # mixed element blocks (columns indexed by vector DOFs)
            out = jnp.zeros((n_u,), dtype=p_vec.dtype)
            return out.at[u_dofs_t.reshape(-1)].add(
                (local_bt @ p_cells)[..., 0].reshape(-1)
            )[:, None]

        def project_mean(p_vec):
            mean = (mp_lumped * p_vec).sum() / mp_total
            return p_vec - mean

        def reduce_cols_f(u_flat):
            return bsr_reduce_cols(st_d, u_flat.reshape(n_s, nc))

        def expand_to_vec(X):
            return bsr_expand_cols(st_d, X, n_s).reshape(-1)

        def solve_a_cols(rhs_red, x0_red, tol_inner):
            return pcg_cols(
                lambda X: bsr_matvec_cols(st_d, values, X),
                rhs_red,
                x0=x0_red,
                precond=precond_cols,
                tol=tol_inner,
                maxiter=inner_maxiter,
            )

        if inner_iters is None:
            solve_a_schur = solve_a_cols
        else:
            def solve_a_schur(rhs_red, x0_red, tol_inner):
                return pcg_cols(
                    lambda X: bsr_matvec_cols(st_d, values, X),
                    rhs_red,
                    x0=x0_red,
                    precond=precond_cols,
                    tol=0.0,
                    maxiter=inner_iters,
                )

        zeros_red = jnp.zeros((st.n_pad, nc), dtype=f.dtype)
        u_f_red, info_f = solve_a_cols(
            reduce_cols_f(f[:, 0]),
            zeros_red,
            f_solve_tol if f_solve_tol is not None else inner_tol,
        )
        rhs_p = project_mean(apply_b(expand_to_vec(u_f_red)[:, None]) - g)

        precond_p = lambda r: project_mean((inv_lump * r)[:, None])[:, 0]
        outer_cap = maxiter if maxiter is not None else 10 * n_p
        p_flat, res_fin, k_out, atol, inner_schur, u_bt = schur_flexible_cg(
            rhs_p[:, 0],
            x0,
            apply_bt_w=lambda d: reduce_cols_f(apply_bt(d[:, None])[:, 0]),
            solve_a=solve_a_schur,
            schur_out=lambda y: project_mean(
                apply_b(expand_to_vec(y)[:, None])
            )[:, 0],
            precond_p=precond_p,
            dot_w=lambda a, b: jnp.sum(a * b),
            zeros_red=zeros_red,
            tol=tol,
            inner_tol=inner_tol,
            inner_eta=inner_eta,
            inner_tol_max=inner_tol_max,
            outer_cap=outer_cap,
        )
        p = project_mean(p_flat[:, None])
        # recovery warm-started from the outer CG's free velocity
        # by-product (see schur_flexible_cg)
        u_red, info_u = solve_a_cols(
            reduce_cols_f((f - apply_bt(p))[:, 0]),
            u_f_red - u_bt,
            recovery_tol if recovery_tol is not None else inner_tol,
        )
        u = expand_to_vec(u_red)[:, None]
        # per-column recovery info -> scalar summaries for the shared
        # StokesInfo contract
        info = StokesInfo(
            outer_iterations=k_out,
            schur_residual=res_fin,
            converged=res_fin <= atol,
            inner_info=info_u._replace(
                residual_norm=jnp.max(info_u.residual_norm)
            ),
            inner_total=info_f.iterations + inner_schur + info_u.iterations,
        )
        return u, p, info

    f_dtype = Vu._coords4global_dofs.dtype
    zero_g = jnp.zeros((n_p, 1), dtype=f_dtype)
    zero_x0 = jnp.zeros((n_p,), dtype=f_dtype)

    def solve(f, g=None, x0=None):
        with _mm_precision(matmul_precision):
            return _run(
                Vs_d,
                Vp_d,
                tables_d,
                agg_table_d,
                local_b_d,
                mp_d,
                u_dofs_d,
                f,
                zero_g if g is None else g,
                zero_x0 if x0 is None else x0[:, 0],
            )

    return solve
