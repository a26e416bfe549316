"""Template-method core of the basis/assembly layer.

Capability parity with the reference ``AbstractBasis``
(/root/reference/torch_fem/basis/abstract_basis.py:10-195), redesigned for
XLA:

* all quadrature-evaluated tensors (shape values, physical gradients,
  integration points, weights, DOF/scatter indices) are precomputed once at
  construction into static-shape device arrays;
* assembly is a differentiable scatter-add (``.at[].add``) instead of
  ``index_put_`` — under jit XLA lowers it to a single fused scatter;
* every integrate/solve method is pure (returns new arrays) and traceable, so
  the whole VPINN loss (assembly included) can sit inside one ``jax.jit`` /
  ``jax.grad``;
* local (unassembled) element tensors are first-class
  (``integrate_*_form_local``) to feed the matrix-free PCG path, which is the
  TPU-native way to solve large systems (no dense n^2 matrix in HBM).

Tensor-shape convention (identical to the reference, SURVEY.md §2):
integrands broadcast over trailing dims (..., n_cells, n_quad, n_loc, n_dim).
"""

from __future__ import annotations

import abc

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config


class AbstractBasis(config.HostConstructed, abc.ABC):
    """Couples a mesh and a reference element into an integration/assembly op set.

    Construction math runs on the host CPU device (``config.HostConstructed``):
    eager dispatch to a tunneled TPU costs ~31 ms RTT per op — minutes per
    basis — while jitted compute picks the arrays up at compile time.
    """

    def __init__(self, mesh, element):
        self._element = element
        self.mesh = mesh

        (
            self.v,
            self.v_grad,
            self.integration_points,
            self._dx,
            self._inv_map_jacobian,
        ) = self._compute_integral_values(mesh, element)

        (
            self._coords4global_dofs,
            self._global_dofs4elements,
            self._nodes4boundary_dofs,
            self._coords4elements,
        ) = self._compute_dofs(mesh, element)

        self._basis_parameters = self._compute_basis_parameters(
            self._coords4global_dofs,
            self._global_dofs4elements,
            self._nodes4boundary_dofs,
        )

    # -- construction pipeline --------------------------------------------

    def _compute_integral_values(self, mesh, element):
        """Evaluate shape functions / weights at quadrature points (once)."""
        map_jacobian = self._compute_jacobian_map(mesh, element)

        det_map_jacobian, inv_map_jacobian = element.compute_det_and_inv_map(
            map_jacobian
        )

        bar_coords = element.compute_barycentric_coordinates(element.gaussian_nodes)

        v, v_grad = element.compute_shape_functions(bar_coords, inv_map_jacobian)

        integration_points = self._compute_integration_points(mesh, bar_coords)

        dx = self._compute_integral_weights(element, det_map_jacobian)

        return v, v_grad, integration_points, dx, inv_map_jacobian

    # -- integration ------------------------------------------------------

    @staticmethod
    def _evaluate_form(function, *args, **kwargs):
        """Evaluate a user form at full f32 matmul precision.

        TPU MXU matmuls default to reduced-precision (bf16) multiplication
        for f32 operands. Harmless for NN training, but an assembly
        integrand computed with 8 mantissa bits perturbs the operator at
        ~1e-3 relative — measured: the benchmark's TPU-vs-CPU solution
        parity degraded 8.8e-6 -> 1.4e-3 the moment the basis arrays
        stopped being compile-time constants (constants were folded in
        full precision on host). Forms must be exact; a user form can
        still opt down via an explicit ``precision=`` inside the closure.
        Costs ~4% on the DFN benchmark.
        """
        with jax.default_matmul_precision("highest"):
            return function(*args, **kwargs)

    def integrate_functional(
        self, function: Callable[..., jnp.ndarray], *args: Any, **kwargs: Any
    ) -> jnp.ndarray:
        """Per-cell integral of a functional: sums quadrature and local axes."""
        return (
            self._evaluate_form(function, self, *args, **kwargs) * self._dx
        ).sum(-3).sum(-2)

    def integrate_bilinear_form_local(
        self, function: Callable[..., jnp.ndarray], *args: Any, **kwargs: Any
    ) -> jnp.ndarray:
        """Unassembled element matrices (..., n_cells, n_loc, n_loc).

        This is the TPU-native primary product: it feeds either the dense
        scatter assembly below or the matrix-free operator in
        ``ops.operators`` without materializing a global matrix.
        """
        return (
            self._evaluate_form(function, self, *args, **kwargs) * self._dx
        ).sum(-3)

    def integrate_linear_form_local(
        self, function: Callable[..., jnp.ndarray], *args: Any, **kwargs: Any
    ) -> jnp.ndarray:
        """Unassembled element load vectors (..., n_cells, n_loc, 1)."""
        return (
            self._evaluate_form(function, self, *args, **kwargs) * self._dx
        ).sum(-3)

    def integrate_bilinear_form(
        self, function: Callable[..., jnp.ndarray], *args: Any, **kwargs: Any
    ) -> jnp.ndarray:
        """Assembled global matrix via differentiable scatter-add."""
        local = self.integrate_bilinear_form_local(function, *args, **kwargs)
        values = self.reshape_for_assembly(local, "bilinear")
        shape = self._basis_parameters["bilinear_form_shape"]
        idx = self._basis_parameters["bilinear_form_idx"]
        return jnp.zeros(shape, dtype=values.dtype).at[idx].add(values)

    def integrate_mixed_bilinear_form_local(
        self,
        trial_basis: "AbstractBasis",
        function: Callable[..., jnp.ndarray],
        *args: Any,
        **kwargs: Any,
    ) -> jnp.ndarray:
        """Unassembled two-space element matrices
        ``(T, n_test_loc, n_trial_loc)`` — the matrix-free counterpart of
        :meth:`integrate_mixed_bilinear_form` (same form contract and
        same-mesh/quadrature checks); feeds the saddle-point operators in
        ``ops.saddle`` without materializing the dense (n_test, n_trial)
        coupling block."""
        if trial_basis.mesh is not self.mesh:
            raise ValueError(
                "mixed forms need test and trial bases on the same mesh"
            )
        if trial_basis._element.integration_order != (
            self._element.integration_order
        ):
            raise ValueError(
                "mixed forms need matching integration orders (got "
                f"{self._element.integration_order} test vs "
                f"{trial_basis._element.integration_order} trial)"
            )
        return (
            self._evaluate_form(function, self, trial_basis, *args, **kwargs)
            * self._dx
        ).sum(-3)

    def integrate_mixed_bilinear_form(
        self,
        trial_basis: "AbstractBasis",
        function: Callable[..., jnp.ndarray],
        *args: Any,
        **kwargs: Any,
    ) -> jnp.ndarray:
        """Assemble a two-space bilinear form into (n_test, n_trial).

        ``self`` carries the TEST functions (rows) and the quadrature
        weights; ``trial_basis`` carries the TRIAL functions (columns).
        Both bases must be built on the same mesh cells with the same
        integration order (so their quadrature points coincide). The form
        closure receives ``(test_basis, trial_basis, *args)`` and returns
        integrands shaped ``(T, q, n_test_loc, n_trial_loc)`` — unbatched
        (leading batch axes are not supported by this scatter; vmap the
        call for batched meshes).

        This is the saddle-point building block the reference lacks
        entirely (e.g. the Taylor-Hood Stokes pressure-divergence coupling
        B[q, u] = -∫ q div u; see ``examples/example_stokes.py``).
        """
        local = self.integrate_mixed_bilinear_form_local(
            trial_basis, function, *args, **kwargs
        )  # (T, n_test_loc, n_trial_loc)
        rows = self._global_dofs4elements
        cols = trial_basis._global_dofs4elements
        out = jnp.zeros(
            (self.n_dofs, trial_basis.n_dofs), dtype=local.dtype
        )
        return out.at[rows[..., :, None], cols[..., None, :]].add(local)

    def integrate_linear_form(
        self, function: Callable[..., jnp.ndarray], *args: Any, **kwargs: Any
    ) -> jnp.ndarray:
        """Assembled global load vector via differentiable scatter-add."""
        return self._assemble_linear_from_local(
            self.integrate_linear_form_local(function, *args, **kwargs)
        )

    # -- reduction / solve ------------------------------------------------

    def reduce(self, tensor: jnp.ndarray) -> jnp.ndarray:
        """Restrict a global matrix/vector to interior (non-Dirichlet) DOFs."""
        idx = self._basis_parameters["inner_dofs"]
        if tensor.shape[-1] != 1:
            return tensor[..., idx, :][..., :, idx]
        return tensor[..., idx, :]

    def solution_tensor(self) -> jnp.ndarray:
        """Zero-initialized global DOF vector (n_dofs, 1)."""
        from .. import config

        return jnp.zeros(
            self._basis_parameters["linear_form_shape"], dtype=config.default_dtype()
        )

    def solve(
        self,
        matrix: jnp.ndarray,
        solution: jnp.ndarray,
        vector: jnp.ndarray,
        only_inner_dofs: bool = True,
    ) -> jnp.ndarray:
        """Direct (dense LU) solve; parity with abstract_basis.py:177-195.

        Returns a *new* solution vector with interior DOFs filled in. For the
        large-scale TPU path use ``solve_iterative`` instead.
        """
        if only_inner_dofs:
            matrix = self.reduce(matrix)
            vector = self.reduce(vector)
        update = jnp.linalg.solve(matrix, vector)
        inner = self._basis_parameters["inner_dofs"]
        return solution.at[..., inner, :].add(update)

    def dirichlet_lift(self, matrix, vector, boundary_values):
        """Impose non-homogeneous Dirichlet data by lifting.

        Given assembled (matrix, vector) and a DOF vector carrying the
        boundary values (entries at interior DOFs are ignored), returns
        ``(u_bc, rhs)`` with the boundary contribution moved to the right-
        hand side: solve the reduced system with ``solve(matrix, u_bc, rhs)``
        and the boundary values are exact in the result.
        """
        inner = self._basis_parameters["inner_dofs"]
        u_bc = boundary_values.at[..., inner, :].set(0.0)
        rhs = vector - matrix @ u_bc
        return u_bc, rhs

    def solve_iterative(
        self,
        local_matrices: jnp.ndarray,
        vector: jnp.ndarray,
        solution: Optional[jnp.ndarray] = None,
        tol: float = 1e-10,
        maxiter: Optional[int] = None,
        only_inner_dofs: bool = True,
        method: str = "bsr",
        precondition: str = "jacobi",
        symmetric_form: bool = False,
        return_info: bool = False,
        solver: str = "cg",
    ) -> jnp.ndarray:
        """Matrix-free preconditioned CG on the reduced system.

        Never materializes the global matrix. ``method="bsr"`` (default)
        assembles into the 8x8 block-sparse operator with spatially
        reordered DOFs (``ops.bsr`` — block row-gathers, the fastest layout
        on gather-bound TPUs); ``method="ell"`` uses the scalar-gather
        hybrid-ELL operator (also the row-sharded multi-chip layout);
        ``method="segment"`` keeps the per-cell gather/matvec/segment-sum
        operator (shard_map-friendly). Structures are cached on the basis.
        ``precondition="two_level"`` adds the aggregate coarse correction —
        worthwhile for large systems; ``"mult_two_level"`` cycles the same
        two levels multiplicatively (fewest iterations, 3 SpMVs/iteration).
        ``symmetric_form=True`` asserts the local matrices are symmetric,
        enabling the canonical-pair assembly (1/3 fewer scattered entries;
        bsr-only — other methods raise so the saving never silently fails
        to apply; wrong results for non-symmetric forms).
        ``solver="bicgstab"`` swaps the Krylov loop for BiCGStab — required
        when the local matrices are NOT symmetric (e.g. Newton
        linearizations from ``solve_newton``, advection terms); CG on a
        non-symmetric operator fails silently.
        """
        from ..ops.solvers import bicgstab, pcg

        if solver == "cg":
            krylov = pcg
        elif solver == "bicgstab":
            krylov = bicgstab
        else:
            raise ValueError(
                f"unknown solver: {solver!r} (expected 'cg' or 'bicgstab')"
            )

        if symmetric_form and method != "bsr":
            raise ValueError(
                "symmetric_form=True is only implemented for method='bsr' "
                f"(got method={method!r}); drop the flag or switch methods"
            )

        if solution is None:
            solution = self.solution_tensor()

        if method == "bsr":
            if not only_inner_dofs:
                raise NotImplementedError(
                    "method='bsr' solves the reduced (interior-DOF) system"
                )
            if precondition not in (
                "two_level", "agg_block", "mult_two_level", "rbm", "jacobi"
            ):
                raise ValueError(
                    f"unknown precondition: {precondition!r} (expected "
                    "'two_level', 'agg_block', 'mult_two_level', 'rbm' or "
                    "'jacobi')"
                )
            from ..ops.bsr import (
                bsr_diagonal,
                bsr_expand,
                bsr_matvec,
                bsr_reduce,
                bsr_values_from_local,
                bsr_values_from_local_symmetric,
                get_bsr_structure,
            )

            from ..ops.bsr import default_max_b

            structure = get_bsr_structure(
                self,
                max_b=default_max_b(self),
                want_entry_slot=not symmetric_form,
            )
            if symmetric_form:
                values = bsr_values_from_local_symmetric(
                    structure, local_matrices
                )
            else:
                values = bsr_values_from_local(structure, local_matrices)
            diag = bsr_diagonal(structure, values)
            precond = None
            if precondition == "two_level":
                # block-Jacobi fine + aggregate coarse correction, one SpMV
                # per CG iteration; switches to the sparse-coarse 3-level
                # when the problem outgrows the dense coarse inverse
                # (ops/precondition.py)
                from ..ops.precondition import auto_preconditioner

                precond = auto_preconditioner(self, structure, values, diag)
            elif precondition == "agg_block":
                # aggregate-sized diagonal-block smoother + same coarse
                # level: measured fastest single-chip choice on the DFN
                # benchmark (72 vs 82 iterations at 107k DOFs)
                from ..ops.precondition import (
                    agg_block_two_level_from_values,
                )

                precond = agg_block_two_level_from_values(
                    structure, values, diag
                )
            elif precondition == "mult_two_level":
                # symmetrized multiplicative V(1,1) cycle: ~half the
                # iterations of the additive two-level for 2 extra SpMVs
                # per apply (ops/precondition.py)
                from ..ops.precondition import mult_two_level_from_values

                precond = mult_two_level_from_values(structure, values, diag)
            elif precondition == "rbm":
                # rigid-body-mode coarse space for vector bases
                # (elasticity): the default for VectorBasis under
                # 'two_level' too — this spelling forces it explicitly
                from ..ops.precondition import (
                    affine_two_level_from_values,
                    get_affine_two_level_structure,
                )

                ast = get_affine_two_level_structure(
                    self, structure, rbm=True
                )
                precond = affine_two_level_from_values(
                    ast, structure, values, diag
                )
            b_pad = bsr_reduce(structure, vector)
            x, info = krylov(
                lambda v: bsr_matvec(structure, values, v),
                b_pad,
                precond_diag=diag,
                precond=precond,
                tol=tol,
                maxiter=maxiter,
            )
            u = solution + bsr_expand(structure, x, self.n_dofs)
            return (u, info) if return_info else u

        rhs = self.reduce(vector) if only_inner_dofs else vector

        if method == "segment":
            if precondition == "two_level":
                raise NotImplementedError(
                    "precondition='two_level' requires method='ell'"
                )
            from ..ops.operators import reduced_operator_from_local

            matvec, diag = reduced_operator_from_local(self, local_matrices)
            precond = None
        else:
            from ..ops.sparse import (
                ell_diagonal,
                ell_matvec,
                ell_values_from_local,
                get_ell_structure,
            )

            structure = get_ell_structure(self, max_k=8)
            values = ell_values_from_local(structure, local_matrices)
            diag = ell_diagonal(structure, values)
            matvec = lambda x: ell_matvec(structure, values, x)
            precond = None
            if precondition == "two_level":
                from ..ops.precondition import (
                    build_two_level_structure,
                    two_level_from_values,
                )

                tl = getattr(self, "_two_level_structure", None)
                if tl is None:
                    inner_ids = np.asarray(
                        self._basis_parameters["inner_dofs"]
                    )
                    coords = np.asarray(self._coords4global_dofs)[inner_ids]
                    tl = build_two_level_structure(structure, coords)
                    self._two_level_structure = tl
                precond = two_level_from_values(tl, structure, values, diag)

        x, info = krylov(
            matvec,
            rhs[..., 0],
            precond_diag=diag,
            precond=precond,
            tol=tol,
            maxiter=maxiter,
        )
        inner = self._basis_parameters["inner_dofs"]
        u = solution.at[..., inner, 0].add(x)
        return (u, info) if return_info else u

    def _iterate_at_quadrature(self, u_cells: jnp.ndarray):
        """Evaluate a local-coefficient block (..., T, n_loc) at quadrature
        points: values ``(..., T, q, 1, 1)`` and gradients
        ``(..., T, q, 1, d)`` for scalar bases; ``(..., T, q, 1, nc)`` and
        ``(..., T, q, 1, nc, d)`` for vector bases (whose ``v_grad``
        carries the extra component axis). The Newton machinery
        differentiates through this with ``jax.jvp``."""
        vals = u_cells[..., None, :, None]
        uh = (vals * self.v).sum(-2, keepdims=True)
        if int(getattr(self, "n_components", 1)) >= 2:
            ugh = (u_cells[..., None, :, None, None] * self.v_grad).sum(
                -3, keepdims=True
            )
        else:
            ugh = (vals * self.v_grad).sum(-2, keepdims=True)
        return uh, ugh

    def _assemble_linear_from_local(self, local: jnp.ndarray) -> jnp.ndarray:
        """Scatter precomputed element vectors (..., T, n_loc, 1) into the
        global load-vector layout (the tail of ``integrate_linear_form``)."""
        values = self.reshape_for_assembly(local, "linear")
        shape = self._basis_parameters["linear_form_shape"]
        idx = self._basis_parameters["linear_form_idx"]
        return jnp.zeros(shape, dtype=values.dtype).at[idx].add(values)

    def solve_newton(
        self,
        residual_form: Callable[..., jnp.ndarray],
        *args: Any,
        solution: Optional[jnp.ndarray] = None,
        tol: float = 1e-10,
        max_iter: int = 25,
        damping: bool = True,
        return_info: bool = False,
        **solve_kwargs: Any,
    ):
        """Newton's method for nonlinear problems F(u)[v] = 0.

        ``residual_form(basis, u, u_grad, *args)`` returns the weak-residual
        integrand against every test function, shaped
        ``(..., T, q, n_loc, 1)`` — exactly a linear-form integrand, except
        it may depend on the current iterate through ``u`` (values at
        quadrature points, ``(..., T, q, 1, 1)``) and ``u_grad``
        (``(..., T, q, 1, d)``). On vector bases the iterate carries the
        component axis like the shape tables do: ``u`` is
        ``(..., T, q, 1, nc)`` and ``u_grad`` ``(..., T, q, 1, nc, d)``
        (nonlinear elasticity, ``tests/test_newton.py``). Example
        (nonlinear Poisson -div((1+u^2) grad u) = f)::

            def residual(b, u, ug):
                kappa = 1.0 + u**2
                return (kappa * (b.v_grad * ug).sum(-1, keepdims=True)
                        - f(b.integration_points) * b.v)

        The consistent Jacobian is exact and free: the per-cell residual is
        differentiated with ``jax.jvp`` against one-hot local-coefficient
        tangents (``n_loc`` forward passes, each batched over all cells),
        yielding element matrices that feed :meth:`solve_iterative`
        unchanged. Newton linearizations are generally non-symmetric, so
        the update solves default to ``solver="bicgstab"``.

        Dirichlet data rides on ``solution`` (the initial iterate — zeros
        by default; seed non-homogeneous values on the boundary DOFs);
        updates are computed on interior DOFs only, so the boundary values
        are preserved exactly. ``damping=True`` backtracks (halves) the
        step while the reduced residual norm does not decrease.

        Stops when the reduced residual norm falls below
        ``tol * max(1, initial norm)`` or after ``max_iter`` iterations.
        Extra ``solve_kwargs`` go to :meth:`solve_iterative` (e.g.
        ``precondition="two_level"``). With ``return_info=True`` also
        returns ``{"iterations", "residual_norms", "converged"}``.

        No reference counterpart: the reference solves only linear systems
        (dense LU, ``/root/reference/torch_fem/basis/abstract_basis.py:177-195``);
        its nonlinear capability is the VPINN training loop, not Newton.
        """
        solve_kwargs.setdefault("solver", "bicgstab")
        solve_kwargs.setdefault("tol", min(tol, 1e-8))
        if solution is None:
            solution = self.solution_tensor()
        u = solution
        dofs = self._global_dofs4elements

        def residual_local(u_cells):
            uh, ugh = self._iterate_at_quadrature(u_cells)
            integrand = self._evaluate_form(
                residual_form, self, uh, ugh, *args
            )
            return (integrand * self._dx).sum(-3)

        n_loc = int(dofs.shape[-1])

        @jax.jit
        def newton_terms(u_vec):
            u_cells = u_vec[..., 0][..., dofs]
            r_local = residual_local(u_cells)
            cols = []
            for j in range(n_loc):
                tangent = jnp.zeros_like(u_cells).at[..., j].set(1.0)
                _, col = jax.jvp(residual_local, (u_cells,), (tangent,))
                cols.append(col)  # (..., T, n_loc, 1)
            j_local = jnp.concatenate(cols, axis=-1)  # (..., T, n_loc, n_loc)
            return self._assemble_linear_from_local(r_local), j_local

        @jax.jit
        def residual_norm(u_vec):
            u_cells = u_vec[..., 0][..., dofs]
            r = self._assemble_linear_from_local(residual_local(u_cells))
            return jnp.linalg.norm(self.reduce(r)), r

        res0, _ = residual_norm(u)
        res0 = float(res0)
        norms = [res0]
        target = tol * max(1.0, res0)
        converged = res0 <= target
        iterations = 0
        for iterations in range(1, max_iter + 1):
            if converged:
                iterations -= 1
                break
            residual, j_local = newton_terms(u)
            delta = self.solve_iterative(j_local, -residual, **solve_kwargs)
            # backtracking: res_new always describes the step actually taken
            step = 1.0
            res_new = float(residual_norm(u + step * delta)[0])
            halvings = 0
            while (
                damping
                and np.isfinite(norms[-1])
                and res_new >= norms[-1]
                and halvings < 12
            ):
                step *= 0.5
                res_new = float(residual_norm(u + step * delta)[0])
                halvings += 1
            u = u + step * delta
            norms.append(res_new)
            converged = res_new <= target
        if return_info:
            return u, {
                "iterations": iterations,
                "residual_norms": norms,
                "converged": bool(converged),
            }
        return u

    def solve_eigsh(
        self,
        a_form: Callable[..., jnp.ndarray],
        m_form: Callable[..., jnp.ndarray],
        k: int = 6,
        *,
        tol: float = 1e-9,
        max_rounds: int = 60,
        solve_tol: float = 1e-10,
        precondition: str = "two_level",
        seed: int = 0,
        return_info: bool = False,
        method: str = "subspace",
    ):
        """Smallest ``k`` eigenpairs of the generalized problem
        a(u, v) = lambda m(u, v) on the interior (non-Dirichlet) DOFs.

        Modal analysis on the matrix-free BSR operators: shift-invert
        subspace iteration (``ops.eigen.subspace_eigsh``) whose inner
        A-solves run the same preconditioned CG as :meth:`solve_iterative`,
        or ``method="lobpcg"`` (``ops.eigen.lobpcg_eigsh``: one
        preconditioner application per round instead of inner A-solves —
        the cheaper round; the compiled path defaults to it). The eager
        default stays subspace iteration: op-by-op it dispatches a handful
        of batched solves, while LOBPCG's many light rounds pay per-op
        latency — use :meth:`compiled_eigsh` where round cost matters.
        Both forms must be symmetric positive definite on the reduced
        space (stiffness/mass pairs). Returns eigenvalues ascending and
        M-orthonormal eigenvectors as full DOF vectors (zeros on Dirichlet
        DOFs), shaped ``(k,)`` and ``(n_dofs, k)``.

        Example: Dirichlet Laplace spectrum on the unit square —
        ``V.solve_eigsh(stiffness, mass, k=4)`` converges to
        pi^2 * (2, 5, 5, 8) at O(h^2). No reference counterpart (the
        reference has no eigen capability; dense LU solves only,
        /root/reference/torch_fem/basis/abstract_basis.py:177-195).
        """
        from ..ops.bsr import (
            bsr_diagonal,
            bsr_expand,
            bsr_matvec,
            bsr_reduce,
            bsr_values_from_local,
            default_max_b,
            get_bsr_structure,
        )
        from ..ops.eigen import lobpcg_eigsh, subspace_eigsh

        if method not in ("subspace", "lobpcg"):
            raise ValueError(
                f"unknown method: {method!r} "
                "(expected 'subspace' or 'lobpcg')"
            )
        # validate before any assembly/preconditioner work; the guard block
        # must also fit in the reduced space or the projected Gram matrix
        # goes singular (NaN Cholesky)
        n_inner = int(np.asarray(self._basis_parameters["inner_dofs"]).size)
        if k > n_inner:
            raise ValueError(
                f"requested k={k} eigenpairs from an n={n_inner} system"
            )
        m_block = min(k + max(2, k // 2), n_inner)

        structure = get_bsr_structure(
            self, max_b=default_max_b(self), want_entry_slot=True
        )
        va = bsr_values_from_local(
            structure, self.integrate_bilinear_form_local(a_form)
        )
        vm = bsr_values_from_local(
            structure, self.integrate_bilinear_form_local(m_form)
        )
        diag = bsr_diagonal(structure, va)
        precond = None
        if precondition == "two_level":
            from ..ops.precondition import auto_preconditioner

            precond = auto_preconditioner(self, structure, va, diag)
        elif precondition != "jacobi":
            raise ValueError(
                f"unknown precondition: {precondition!r} "
                "(expected 'two_level' or 'jacobi')"
            )

        # starting block in the padded reduced layout: random on interior
        # DOFs, exactly zero on padding rows (bsr_reduce guarantees that);
        # built in ONE dispatch instead of m_block eager round-trips
        rng = np.random.default_rng(seed)
        rand = jnp.asarray(
            rng.standard_normal((self.n_dofs, m_block)),
            dtype=config.default_dtype(),
        )
        x0 = jax.jit(
            lambda r: jnp.stack(
                [bsr_reduce(structure, r[:, j]) for j in range(m_block)],
                axis=1,
            )
        )(rand)

        if method == "lobpcg":
            from ..ops.eigen import EighInfo

            vals, vecs_pad, (rounds, change, conv) = jax.jit(
                lambda x0_: lobpcg_eigsh(
                    lambda v: bsr_matvec(structure, va, v),
                    lambda v: bsr_matvec(structure, vm, v),
                    x0_,
                    k,
                    tol=tol,
                    max_rounds=max(max_rounds, 200),
                    precond=precond,
                    precond_diag=None if precond is not None else diag,
                )
            )(x0)
            info = EighInfo(
                iterations=int(rounds),
                eig_change=float(change),
                converged=bool(conv),
            )
        else:
            vals, vecs_pad, info = subspace_eigsh(
                lambda v: bsr_matvec(structure, va, v),
                lambda v: bsr_matvec(structure, vm, v),
                n=x0.shape[0],
                k=k,
                n_extra=m_block - k,
                tol=tol,
                max_rounds=max_rounds,
                solve_tol=solve_tol,
                precond=precond,
                precond_diag=None if precond is not None else diag,
                x0=x0,
                dtype=config.default_dtype(),
            )
        vectors = jnp.stack(
            [
                bsr_expand(structure, vecs_pad[:, j], self.n_dofs)[..., 0]
                for j in range(k)
            ],
            axis=1,
        )
        if return_info:
            return vals, vectors, info
        return vals, vectors

    def compiled_solver(self, bilinear_form, linear_form=None, **kwargs):
        """One-jit assemble+solve pipeline for this basis (BSR path).

        ``solve_iterative`` dispatches each op eagerly — on a tunneled TPU
        that costs ~31 ms RTT per op (a 36k-DOF 3D solve measured 8.4 s
        eager vs 0.17 s compiled). This builds every host structure once
        and returns ``solve() -> (u, PCGInfo)`` compiled to a single XLA
        program; see :func:`ops.compiled.compiled_bsr_solver` for options.
        """
        from ..ops.compiled import compiled_bsr_solver

        return compiled_bsr_solver(self, bilinear_form, linear_form, **kwargs)

    def compiled_refined(self, bilinear_form, linear_form=None, **kwargs):
        """One-jit mixed-precision refined solve: f32 two-level PCG inner
        + f64 residual recomputation, recovering x64-CPU-grade accuracy on
        an f32 accelerator (measured 3.3e-16 off the dense x64 solve at
        33k DOFs after 2 passes). Needs an x64-constructed basis; the
        operator/rhs assemble once at construction. Returns
        ``solve(b=None) -> (u, RefineInfo)``; see
        :func:`ops.refine.compiled_refined_solver` for options.
        """
        from ..ops.refine import compiled_refined_solver

        return compiled_refined_solver(
            self, bilinear_form, linear_form, **kwargs
        )

    def compiled_eigsh(self, a_form, m_form, k: int = 6, **kwargs):
        """One-jit generalized eigensolve: compiled counterpart of
        :meth:`solve_eigsh` (assembly + preconditioner + the whole
        subspace iteration in a single XLA program). Returns
        ``solve() -> (vals, vecs, (rounds, eig_change, converged))``;
        see :func:`ops.compiled.compiled_eigsh_solver` for options.
        """
        from ..ops.compiled import compiled_eigsh_solver

        return compiled_eigsh_solver(self, a_form, m_form, k, **kwargs)

    def compiled_newton(self, residual_form, **kwargs):
        """One-jit Newton solve: the compiled counterpart of
        :meth:`solve_newton` (same residual-form contract). The whole
        iteration — assembly, jvp Jacobians, BiCGStab updates, damping —
        is a single XLA program; see
        :func:`ops.compiled.compiled_newton_solver` for options. Returns
        ``solve(u0=None) -> (u, (iterations, residual_norm, converged))``.
        """
        from ..ops.compiled import compiled_newton_solver

        return compiled_newton_solver(self, residual_form, **kwargs)

    def gram_solver(
        self,
        form: Callable[..., jnp.ndarray],
        method: str = "cholesky",
        tol: Optional[float] = None,
        maxiter: Optional[int] = None,
        precondition: str = "two_level",
    ) -> Callable[..., jnp.ndarray]:
        """Differentiable ``r -> G^{-1} r`` on the reduced DOFs, where G is
        the Gram matrix of ``form`` on this basis (RVPINN loss
        ``r^T G^{-1} r``, reference examples/example_weak.py:84-86).

        * ``method="cholesky"``: factor the dense reduced Gram once
          (O(n^2) memory like the reference's ``torch.inverse``, but a
          stable triangular solve per application).
        * ``method="pcg"``: matrix-free PCG on the hybrid-ELL operator —
          O(nnz) memory, so RVPINN test spaces scale with the FEM side.
          Wrapped in a custom VJP (G is SPD and constant, so the backward
          pass is another solve), making the returned callable safe under
          ``jax.grad`` despite the inner ``while_loop``.

        The returned callable accepts ``(n_inner, 1)`` or ``(n_inner,)``
        vectors and preserves the shape. The pcg variant additionally
        accepts an optional warm-start iterate: ``solve(r, x0)``. ``x0``
        only sets the inner iteration's starting point — it carries no
        gradient (treated via ``stop_gradient``) — so threading the
        previous epoch's solution through a training-scan carry cuts PCG
        iterations without changing the loss's derivative.

        The backward solve warm-starts itself: for the RVPINN quadratic
        loss the output cotangent is parallel to ``r`` (d/dr of
        ``r^T G^{-1} r`` routes ``r`` back through the solve), so the
        saved forward solution, rescaled by ``<cot, x>/<r, x>``, is an
        (often exact) initial guess and the backward PCG terminates in
        O(1) iterations instead of re-converging from zero.

        ``precondition``: ``"two_level"`` (default) builds the aggregate
        two-level preconditioner ONCE here — G is constant, so unlike the
        per-solve paths this is free per application; ``"jacobi"`` keeps
        the plain diagonal (tiny problems fall back automatically).

        ``tol`` defaults to the working precision: 1e-12 under x64, 1e-6
        in float32 (the TPU default) — a fixed 1e-12 target is unreachable
        in f32 (eps ~1.2e-7) and would spin the pcg path to its iteration
        cap on every application.
        """
        if tol is None:
            tol = 1e-12 if jnp.finfo(config.default_dtype()).eps < 1e-10 else 1e-6
        if method == "cholesky":
            from jax.scipy.linalg import cho_factor, cho_solve

            gram = self.reduce(self.integrate_bilinear_form(form))
            factor = cho_factor(gram)
            return lambda r: cho_solve(factor, r)

        if method != "pcg":
            raise ValueError(
                f"unknown gram_solver method: {method!r} "
                "(expected 'cholesky' or 'pcg')"
            )

        from ..ops.solvers import pcg
        from ..ops.sparse import (
            ell_diagonal,
            ell_matvec,
            ell_values_from_local,
            get_ell_structure,
        )

        structure = get_ell_structure(self, max_k=8)
        local = self.integrate_bilinear_form_local(form)
        values = ell_values_from_local(structure, local)
        diag = ell_diagonal(structure, values)
        n = structure.n_inner
        cap = maxiter if maxiter is not None else max(10 * n, 100)

        precond = None
        if precondition == "two_level" and n >= 256:
            # G is constant across applications: build the whole two-level
            # preconditioner once (structure on host, values on device) and
            # close over it — every later solve, forward AND backward,
            # reuses it (VERDICT r04 item 3)
            from ..ops.precondition import (
                build_two_level_structure,
                two_level_from_values,
            )

            coords = np.asarray(self._coords4global_dofs)[
                np.asarray(self._basis_parameters["inner_dofs"])
            ]
            tl = build_two_level_structure(structure, coords, leaf=32, kp=4)
            precond = two_level_from_values(tl, structure, values, diag)

        def _solve_flat(r_flat, x0_flat):
            x, _ = pcg(
                lambda v: ell_matvec(structure, values, v),
                r_flat,
                x0=x0_flat,
                precond=precond,
                precond_diag=None if precond is not None else diag,
                tol=tol,
                maxiter=cap,
            )
            return x

        @jax.custom_vjp
        def _solve2(r, x0):
            return _solve_flat(r.reshape(-1), x0.reshape(-1)).reshape(r.shape)

        def _solve2_fwd(r, x0):
            x = _solve2(r, x0)
            return x, (r, x)

        def _solve2_bwd(res, cotangent):
            r, x = res
            # G symmetric: the cotangent pullback is another G-solve. Seed
            # it with the rescaled forward solution: when cot ∝ r (the
            # r^T G^{-1} r loss), a = <cot,x>/<r,x> makes a*x the EXACT
            # backward solution and PCG exits on the initial residual test.
            xf = x.reshape(-1)
            cf = cotangent.reshape(-1)
            rf = r.reshape(-1)
            denom = jnp.dot(rf, xf)  # = x^T G x >= 0, zero only if x == 0
            safe = jnp.where(denom == 0, 1.0, denom)
            a = jnp.where(denom == 0, 0.0, jnp.dot(cf, xf) / safe)
            y = _solve_flat(cf, a * xf)
            return y.reshape(cotangent.shape), jnp.zeros_like(x)

        _solve2.defvjp(_solve2_fwd, _solve2_bwd)

        def solve(r, x0=None):
            if x0 is None:
                x0 = jnp.zeros_like(r)
            return _solve2(r, jax.lax.stop_gradient(x0))

        return solve

    # -- abstract surface -------------------------------------------------

    @abc.abstractmethod
    def _compute_dofs(self, mesh, element) -> Tuple:
        """DOF coordinates/maps: (coords4global_dofs, global_dofs4elements,
        nodes4boundary_dofs, coords4elements)."""

    @abc.abstractmethod
    def _compute_basis_parameters(
        self, coords4global_dofs, global_dofs4elements, nodes4boundary_dofs
    ) -> dict:
        """Assembly shapes + scatter indices + interior DOF list."""

    @abc.abstractmethod
    def _compute_jacobian_map(self, mesh, element):
        """Affine map Jacobian from reference to physical element."""

    @abc.abstractmethod
    def _compute_integration_points(self, mesh, bar_coords):
        """Physical quadrature points per element."""

    def _compute_integral_weights(self, element, det_map_jacobian):
        """Quadrature weights x reference measure x |det J| (x extra scales).

        Default covers every non-fracture basis; fracture bases multiply an
        additional area scale."""
        return (
            element.reference_element_area
            * element.gaussian_weights
            * det_map_jacobian
        )

    def _build_assembly_parameters(
        self,
        nb_global_dofs: int,
        global_dofs4elements,
        nodes4boundary_dofs,
        batch_size: Optional[int] = None,
    ) -> dict:
        """Shared scatter-index / interior-DOF construction.

        With ``batch_size`` set, shapes gain a leading batch axis and the
        scatter tuple a batch index (patches/fracture-edge bases); boundary
        markers must then be identical across the batch, since ``reduce``
        applies one interior-DOF list to every entry.
        """
        from .. import config

        nb_local_dofs = int(global_dofs4elements.shape[-1])
        markers_all = self._as_host_index(nodes4boundary_dofs)
        if batch_size is not None:
            if not (markers_all == markers_all[:1]).all():
                raise NotImplementedError(
                    "batched bases require identical boundary markers across "
                    "the batch (reduce() applies one interior-DOF list)"
                )
            markers = markers_all[0].reshape(-1)
        else:
            markers = markers_all.reshape(-1)
        inner_dofs = jnp.asarray(
            np.nonzero(markers != 1)[0], dtype=config.index_dtype()
        )

        dofs = global_dofs4elements
        if batch_size is None:
            rows_idx = jnp.repeat(dofs, nb_local_dofs, axis=-1).reshape(-1)
            cols_idx = jnp.tile(dofs, (1, nb_local_dofs)).reshape(-1)
            form_idx = dofs.reshape(-1)
            return {
                "bilinear_form_shape": (nb_global_dofs, nb_global_dofs),
                "bilinear_form_idx": (rows_idx, cols_idx),
                "linear_form_shape": (nb_global_dofs, 1),
                "linear_form_idx": (form_idx,),
                "inner_dofs": inner_dofs,
                "nb_dofs": nb_global_dofs,
            }

        batch_idx = jnp.arange(batch_size, dtype=config.index_dtype())[:, None]
        rows_idx = jnp.repeat(dofs, nb_local_dofs, axis=-1).reshape(
            batch_size, -1
        )
        cols_idx = jnp.tile(dofs, (1, 1, nb_local_dofs)).reshape(batch_size, -1)
        form_idx = dofs.reshape(batch_size, -1)
        return {
            "bilinear_form_shape": (batch_size, nb_global_dofs, nb_global_dofs),
            "bilinear_form_idx": (batch_idx, rows_idx, cols_idx),
            "linear_form_shape": (batch_size, nb_global_dofs, 1),
            "linear_form_idx": (batch_idx, form_idx),
            "inner_dofs": inner_dofs,
            "nb_dofs": nb_global_dofs,
        }

    # -- helpers ----------------------------------------------------------

    def reshape_for_assembly(self, local: jnp.ndarray, form: str) -> jnp.ndarray:
        """Flatten local element tensors into the scatter-value layout."""
        if form == "bilinear":
            return local.reshape(-1)
        if form == "linear":
            return local.reshape(-1, 1)
        raise NotImplementedError(f"Unknown form type: {form}")

    @property
    def n_dofs(self) -> int:
        return int(self._basis_parameters["nb_dofs"])

    @property
    def element(self):
        return self._element

    @staticmethod
    def _as_host_index(array) -> np.ndarray:
        """Host copy of an index array for dynamic-shape setup math."""
        return np.asarray(array)


def _is_array_leaf(x) -> bool:
    return isinstance(x, (jnp.ndarray, np.ndarray, jax.Array))


#: derived solver-layout caches a basis may carry; never part of its pytree
_CACHE_ATTRS = (
    "_bsr_structures",
    "_ell_structures",
    "_two_level_structure",
    "_three_level_structures",
    "_agg_block_tables",
    "_affine_two_level_structures",
    "_chunk_tables",
    "_bsr_shard_plans",
    "_bsr_sharded_runs",
)


def _is_static_value(x) -> bool:
    """True for hashable scalars that must stay static under jit (sizes,
    shape tuples, flags) — everything else is a dynamic child."""
    if isinstance(x, (bool, int, float, str, bytes, type(None))):
        return True
    return isinstance(x, tuple) and all(_is_static_value(v) for v in x)


def _basis_flatten(basis: AbstractBasis):
    """Split state into traced array leaves and static aux (shapes, element).

    Partitioned entry-wise: array(-containing) values are dynamic children;
    plain scalars (batch sizes like ``nb_patches``, shape tuples inside
    ``_basis_parameters``) are static aux — leaving them dynamic would turn
    sizes used as reshape targets into tracers under jit. Solver-layout
    caches (``ops.bsr``/``ops.sparse`` structures, host index tables) are
    dropped entirely: they are derived state, rebuilt on demand, and keeping
    them would change the pytree structure after the first solve (silent
    recompiles for any jitted function taking the basis as an argument).
    """
    state = dict(basis.__dict__)
    element = state.pop("_element")
    params = state.pop("_basis_parameters", None)
    for cache_key in _CACHE_ATTRS:
        state.pop(cache_key, None)

    def partition(items):
        dyn, static = {}, {}
        for key, value in items:
            if _is_static_value(value):
                static[key] = value
            else:
                dyn[key] = value
        return dyn, static

    dyn_params, static_params = partition(params.items() if params else ())
    dyn_state, static_state = partition(state.items())

    children = {"state": dyn_state, "params": dyn_params}
    aux = (
        type(basis),
        element,
        tuple(sorted(static_params.items())),
        tuple(sorted(static_state.items())),
    )
    return (children,), aux


def _basis_unflatten(aux, children):
    cls, element, static_params, static_state = aux
    obj = cls.__new__(cls)
    obj.__dict__.update(dict(static_state))
    obj.__dict__.update(children[0]["state"])
    obj._element = element
    params = dict(static_params)
    params.update(children[0]["params"])
    obj._basis_parameters = params
    return obj


def register_basis_pytree(cls):
    jax.tree_util.register_pytree_node(cls, _basis_flatten, _basis_unflatten)
    return cls
