"""Mixed (two-space) assembly + Taylor-Hood Stokes (beyond the reference).

Validates integrate_mixed_bilinear_form against a NumPy per-element loop
oracle, checks the discrete div-compatibility identity B 1_u-components,
and pins the manufactured Stokes convergence rates (P2-P1: O(h^3)
velocity, O(h^2) pressure).
"""

import math
import subprocess
import sys
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pytorch_fem_solver_tpu as fem


def div_form(test_p, trial_u):
    div = jnp.trace(trial_u.v_grad, axis1=-2, axis2=-1)
    q_vals = test_p.v[..., 0]
    return -(q_vals[..., :, None] * div[..., None, :])


def test_mixed_form_matches_numpy_oracle():
    """B[q, u] = -∫ q div u vs an independent per-element P1xP1 loop."""
    mesh = fem.MeshTri(fem.unit_square(n=3))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 2))
    Vu = fem.VectorBasis(mesh, fem.ElementTri(1, 2))
    B = np.asarray(Vp.integrate_mixed_bilinear_form(Vu, div_form))

    verts = np.asarray(mesh["vertices", "coordinates"])
    tris = np.asarray(mesh["cells", "vertices"])
    n = len(verts)
    B_ref = np.zeros((n, 2 * n))
    gref = np.array([[-1.0, -1.0], [1.0, 0.0], [0.0, 1.0]])
    for tri in tris:
        p = verts[tri]
        J = np.stack([p[1] - p[0], p[2] - p[0]], axis=1)
        area = abs(np.linalg.det(J)) / 2
        g = gref @ np.linalg.inv(J)  # (3, 2)
        # -∫ q_i div(phi_j e_c): q integrates to area/3 per vertex; div of
        # (phi_j e_c) is g[j, c] (constant)
        for i in range(3):
            for j in range(3):
                for c in range(2):
                    B_ref[tri[i], 2 * tri[j] + c] -= area / 3 * g[j, c]
    np.testing.assert_allclose(B, B_ref, atol=1e-13)


def test_mixed_form_validation():
    mesh = fem.MeshTri(fem.unit_square(n=2))
    mesh2 = fem.MeshTri(fem.unit_square(n=3))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 2))
    with pytest.raises(ValueError, match="same mesh"):
        Vp.integrate_mixed_bilinear_form(
            fem.VectorBasis(mesh2, fem.ElementTri(1, 2)), div_form
        )
    with pytest.raises(ValueError, match="integration orders"):
        Vp.integrate_mixed_bilinear_form(
            fem.VectorBasis(mesh, fem.ElementTri(1, 4)), div_form
        )


def test_stokes_taylor_hood_convergence():
    """Drive the Stokes example; the printed rates must hit TH theory."""
    examples = pathlib.Path(__file__).resolve().parent.parent / "examples"
    out = subprocess.run(
        [sys.executable, "example_stokes.py"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=str(examples),
        env={
            **__import__("os").environ,
            "JAX_PLATFORMS": "cpu",
            "JAX_PLATFORM_NAME": "cpu",
            "FEM_LEVELS": "3",
        },
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = [l for l in out.stdout.splitlines() if "rates" in l][-1]
    u_rate = float(last.split("rates u")[1].split()[0])
    p_rate = float(last.split(" p ")[-1])
    assert u_rate > 2.7, last
    assert p_rate > 1.7, last


def test_stokes_taylor_hood_3d():
    """The mixed machinery is dimension-agnostic: P2-P1 Stokes on tets
    converges at the Taylor-Hood velocity rate."""
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

    def psi_vec(x):
        w = (
            (x[0] * (1 - x[0])) ** 2
            * (x[1] * (1 - x[1])) ** 2
            * (x[2] * (1 - x[2])) ** 2
        )
        return jnp.stack([w, -w, 2 * w])

    def u_fn(x):
        J = jax.jacfwd(psi_vec)(x)
        return jnp.stack(
            [J[2, 1] - J[1, 2], J[0, 2] - J[2, 0], J[1, 0] - J[0, 1]]
        )

    def p_fn(x):
        return x[0] ** 3 + x[1] ** 3 + x[2] ** 3 - 0.75

    def f_fn(x):
        lap = jnp.trace(
            jax.jacfwd(jax.jacfwd(u_fn))(x), axis1=-2, axis2=-1
        )
        return -lap + jax.grad(p_fn)(x)

    def vmapped(fn, pts):
        flat = pts.reshape(-1, 3)
        out = jax.vmap(fn)(flat)
        return out.reshape(pts.shape[:-1] + out.shape[1:])

    def a_form(b):
        g = b.v_grad
        return jnp.einsum("...icd,...jcd->...ij", g, g)

    def load(b):
        pts = b.integration_points[..., 0, :]
        return (b.v * vmapped(f_fn, pts)[..., None, :]).sum(
            -1, keepdims=True
        )

    errs = []
    for n in (2, 4):
        mesh = MeshTet(unit_cube(n))
        Vu = fem.VectorBasis(mesh, ElementTet(2, 4))
        Vp = fem.Basis(mesh, ElementTet(1, 4))
        A = Vu.reduce(Vu.integrate_bilinear_form(a_form))
        f = Vu.reduce(Vu.integrate_linear_form(load))
        inner_u = Vu._basis_parameters["inner_dofs"]
        B = Vp.integrate_mixed_bilinear_form(Vu, div_form)[:, inner_u]
        n_u, n_p = A.shape[0], B.shape[0]
        K = jnp.zeros((n_u + n_p, n_u + n_p))
        K = (
            K.at[:n_u, :n_u].set(A)
            .at[n_u:, :n_u].set(B)
            .at[:n_u, n_u:].set(B.T)
        )
        pin = n_u + n_p - 1
        K = K.at[pin, :].set(0.0).at[:, pin].set(0.0).at[pin, pin].set(1.0)
        sol = jnp.linalg.solve(K, jnp.concatenate([f, jnp.zeros((n_p, 1))]))
        u = Vu.solution_tensor().at[inner_u, :].set(sol[:n_u])
        uh, _ = Vu.interpolate(Vu, u)
        pts = Vu.integration_points[..., 0, :]
        ue = vmapped(u_fn, pts)
        errs.append(
            float(
                jnp.sqrt(
                    jnp.sum(
                        Vu.integrate_functional(
                            lambda b_: ((uh[..., 0, :] - ue) ** 2).sum(-1)[
                                ..., None, None
                            ]
                        )
                    )
                )
            )
        )
    assert math.log2(errs[0] / errs[1]) > 2.7, errs


# -- matrix-free saddle-point solver -------------------------------------------


def test_stokes_solver_matches_dense():
    """ops.stokes_solver (Schur-complement CG, lumped-mass preconditioned,
    matrix-free B through unassembled mixed element matrices) lands on the
    dense pinned-LU Taylor-Hood solution."""
    from pytorch_fem_solver_tpu.ops import stokes_solver

    mu = 1.0

    def psi(x):
        return (x[0] * (1 - x[0])) ** 2 * (x[1] * (1 - x[1])) ** 2

    def u_fn(x):
        g = jax.grad(psi)(x)
        return jnp.stack([g[1], -g[0]])

    def f_fn(x):
        lap = jnp.trace(
            jax.jacfwd(jax.jacfwd(u_fn))(x), axis1=-2, axis2=-1
        )
        p_grad = jnp.asarray([3 * x[0] ** 2, 3 * x[1] ** 2])
        return -mu * lap + p_grad

    def a_form(b):
        g = b.v_grad
        return mu * jnp.einsum("...icd,...jcd->...ij", g, g)

    def load(b):
        pts = b.integration_points[..., 0, :]
        f = jax.vmap(f_fn)(pts.reshape(-1, 2)).reshape(
            pts.shape[:-1] + (2,)
        )
        return (b.v * f[..., None, :]).sum(-1, keepdims=True)

    mesh = fem.MeshTri(fem.unit_square(n=6))
    Vu = fem.VectorBasis(mesh, fem.ElementTri(2, 4))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 4))

    # dense reference (pinned constant mode), as in example_stokes
    A = Vu.reduce(Vu.integrate_bilinear_form(a_form))
    f_red = Vu.reduce(Vu.integrate_linear_form(load))
    B = Vp.integrate_mixed_bilinear_form(Vu, div_form)[
        :, Vu._basis_parameters["inner_dofs"]
    ]
    n_u, n_p = A.shape[0], B.shape[0]
    K = jnp.zeros((n_u + n_p, n_u + n_p))
    K = (
        K.at[:n_u, :n_u].set(A)
        .at[n_u:, :n_u].set(B)
        .at[:n_u, n_u:].set(B.T)
    )
    pin = n_u + n_p - 1
    K = K.at[pin, :].set(0.0).at[:, pin].set(0.0).at[pin, pin].set(1.0)
    sol = jnp.linalg.solve(
        K, jnp.concatenate([f_red, jnp.zeros((n_p, 1))])
    )
    u_ref = Vu.solution_tensor().at[
        Vu._basis_parameters["inner_dofs"], :
    ].set(sol[:n_u])
    p_ref = np.asarray(sol[n_u:, 0])

    solve = stokes_solver(
        Vu, Vp, a_form, div_form, tol=1e-10, inner_tol=1e-12
    )
    u, p, info = solve(Vu.integrate_linear_form(load))
    assert bool(info.converged)
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(u_ref), atol=1e-9
    )
    pc = np.asarray(p[:, 0])
    np.testing.assert_allclose(
        pc - pc.mean(), p_ref - p_ref.mean(), atol=1e-7
    )
    # the discrete constraint holds: ||B u|| ~ 0 against every q
    u_cells = u[..., 0][Vu._global_dofs4elements][..., None]
    local_b = Vp.integrate_mixed_bilinear_form_local(Vu, div_form)
    bu = Vp._assemble_linear_from_local(local_b @ u_cells)
    assert float(jnp.abs(bu).max()) < 1e-9


def test_stokes_solver_3d():
    """The matrix-free Schur solver is dimension-agnostic: on a tet mesh
    it converges and satisfies the discrete divergence constraint."""
    from pytorch_fem_solver_tpu.element import ElementTet
    from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube
    from pytorch_fem_solver_tpu.ops import stokes_solver

    def a_form(b):
        g = b.v_grad
        return jnp.einsum("...icd,...jcd->...ij", g, g)

    def load(b):
        # constant body force (lid-driven-like enclosed forcing)
        f = jnp.asarray([1.0, 0.0, -0.5])
        return (f * b.v).sum(-1, keepdims=True)

    mesh = MeshTet(unit_cube(3))
    Vu = fem.VectorBasis(mesh, ElementTet(2, 3))
    Vp = fem.Basis(mesh, ElementTet(1, 3))
    solve = stokes_solver(Vu, Vp, a_form, div_form, tol=1e-8, inner_tol=1e-10)
    u, p, info = solve(Vu.integrate_linear_form(load))
    assert bool(info.converged)
    assert np.isfinite(np.asarray(u)).all() and np.isfinite(np.asarray(p)).all()
    # discrete divergence constraint
    local_b = Vp.integrate_mixed_bilinear_form_local(Vu, div_form)
    u_cells = u[..., 0][Vu._global_dofs4elements][..., None]
    bu = Vp._assemble_linear_from_local(local_b @ u_cells)
    scale = float(jnp.abs(u).max())
    assert float(jnp.abs(bu).max()) < 1e-7 * max(scale, 1e-30) + 1e-10
    # pressure has zero lumped-mass mean
    mp = Vp._assemble_linear_from_local(
        Vp.integrate_bilinear_form_local(
            lambda b_: b_.v @ jnp.matrix_transpose(b_.v)
        ).sum(-1, keepdims=True)
    )
    assert abs(float((mp * p).sum())) < 1e-10


def test_compiled_stokes_matches_eager():
    """compiled_stokes_solver lands on the eager stokes_solver solution
    through BOTH methods — the default nested Schur CG and the x64-only
    block-preconditioned MINRES on the full saddle system — and a second
    call with a different right-hand side reuses the compiled program.
    The trailing precondition="jacobi" check exercises the default method
    (schur)."""
    from pytorch_fem_solver_tpu.ops import compiled_stokes_solver, stokes_solver

    def a_form(b):
        g = b.v_grad
        return jnp.einsum("...icd,...jcd->...ij", g, g)

    def load(b):
        pts = b.integration_points[..., 0, :]
        f = jnp.stack(
            [jnp.sin(math.pi * pts[..., 0]), pts[..., 1] ** 2], axis=-1
        )
        return (b.v * f[..., None, :]).sum(-1, keepdims=True)

    mesh = fem.MeshTri(fem.unit_square(n=6))
    Vu = fem.VectorBasis(mesh, fem.ElementTri(2, 4))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 4))
    f = Vu.integrate_linear_form(load)

    solve_eager = stokes_solver(Vu, Vp, a_form, div_form, tol=1e-10, inner_tol=1e-12)
    u_ref, p_ref, info_ref = solve_eager(f)
    assert bool(info_ref.converged)

    for method in ("minres", "schur"):
        solve_c = compiled_stokes_solver(
            Vu, Vp, a_form, div_form, tol=1e-10, inner_tol=1e-12,
            method=method,
        )
        u, p, info = solve_c(f)
        assert bool(info.converged), method
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(u_ref), atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(p_ref), atol=1e-7
        )

        # warm call, different rhs: same program, consistent answer
        u2, p2, info2 = solve_c(2.0 * f)
        assert bool(info2.converged), method
        np.testing.assert_allclose(
            np.asarray(u2), 2.0 * np.asarray(u_ref), atol=2e-8
        )

    # jacobi A-block preconditioner path also agrees (default method)
    u3, p3, info3 = compiled_stokes_solver(
        Vu, Vp, a_form, div_form, tol=1e-10, inner_tol=1e-12,
        precondition="jacobi",
    )(f)
    assert bool(info3.converged)
    np.testing.assert_allclose(np.asarray(u3), np.asarray(u_ref), atol=1e-8)


def test_compiled_stokes_fixed_inner_iters():
    """inner_iters=K (fixed-iteration inexact Schur applies + the free
    velocity-accumulation recovery warm start) still lands on the eager
    solution: the f-solve and recovery tolerances bound the final error
    regardless of the applies' inexactness, and the flexible outer CG
    absorbs the non-stationarity. Covers both the interleaved vector path
    and the component-decoupled scalar (pcg_cols) path."""
    from pytorch_fem_solver_tpu.ops import compiled_stokes_solver, stokes_solver

    def a_form(b):
        g = b.v_grad
        return jnp.einsum("...icd,...jcd->...ij", g, g)

    def load(b):
        pts = b.integration_points[..., 0, :]
        f = jnp.stack(
            [jnp.sin(math.pi * pts[..., 0]), pts[..., 1] ** 2], axis=-1
        )
        return (b.v * f[..., None, :]).sum(-1, keepdims=True)

    mesh = fem.MeshTri(fem.unit_square(n=6))
    Vu = fem.VectorBasis(mesh, fem.ElementTri(2, 4))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 4))
    f = Vu.integrate_linear_form(load)

    solve_eager = stokes_solver(
        Vu, Vp, a_form, div_form, tol=1e-10, inner_tol=1e-12
    )
    u_ref, p_ref, info_ref = solve_eager(f)
    assert bool(info_ref.converged)

    a_scalar = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    for extra in (
        {},
        {"a_scalar_form": a_scalar},
    ):
        # K large enough for the tiny problem: the fixed-K mode's TRUE
        # accuracy is governed by K (the outer recurrence residual is not
        # the true Schur residual under inexact applies) — measured here
        # du ~1e-7 at K=25 vs 2.4e-3 at K=6
        u, p, info = compiled_stokes_solver(
            Vu, Vp, a_form, div_form, tol=1e-10, inner_tol=1e-12,
            inner_iters=25, **extra,
        )(f)
        assert bool(info.converged), extra
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(u_ref), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(p_ref), atol=1e-5
        )

        # very loose applies (K=6) must stay FINITE and land in the
        # accuracy-floor neighbourhood — the negative-curvature/stall
        # guards in schur_flexible_cg return the best iterate instead of
        # diverging to the outer cap (the unguarded failure mode)
        u6, p6, info6 = compiled_stokes_solver(
            Vu, Vp, a_form, div_form, tol=1e-10, inner_tol=1e-12,
            inner_iters=6, **extra,
        )(f)
        assert np.isfinite(np.asarray(u6)).all(), extra
        assert np.isfinite(np.asarray(p6)).all(), extra
        assert np.abs(np.asarray(u6) - np.asarray(u_ref)).max() < 0.05


def test_minres_restart_zero_rejected():
    """restart=0 would lower a traced (k+1) % 0 into XLA (undefined);
    the solver rejects it up front — 'no restarts' is spelled None."""
    import pytest

    from pytorch_fem_solver_tpu.ops.solvers import minres

    b = jnp.ones((4,))
    with pytest.raises(ValueError, match="restart"):
        minres(lambda x: 2.0 * x, b, restart=0)
    # restart=None and restart>=1 both run fine on a trivial SPD operator
    for r in (None, 2):
        x, info = minres(lambda x: 2.0 * x, b, tol=1e-12, restart=r)
        np.testing.assert_allclose(np.asarray(x), 0.5 * np.asarray(b), atol=1e-10)


def test_compiled_stokes_scalar_a_path():
    """The component-decoupled path (``a_scalar_form``: scalar operator,
    component columns as simultaneous pcg_cols right-hand sides) lands on
    the generic vector-BSR solution, both preconditioners, plus the
    agg_rbm vector preconditioner variant — same discrete system, so
    parity is to solver tolerance. Also pins the validation guards."""
    from pytorch_fem_solver_tpu.ops import compiled_stokes_solver

    def a_form(b):
        g = b.v_grad
        return jnp.einsum("...icd,...jcd->...ij", g, g)

    a_scalar = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)

    def load(b):
        pts = b.integration_points[..., 0, :]
        x, y = pts[..., 0], pts[..., 1]
        fx = math.pi * jnp.sin(math.pi * x) * jnp.cos(math.pi * y)
        fy = -math.pi * jnp.cos(math.pi * x) * jnp.sin(math.pi * y) + y**2
        return (b.v * jnp.stack([fx, fy], axis=-1)[..., None, :]).sum(
            -1, keepdims=True
        )

    mesh = fem.MeshTri(fem.unit_square(n=8))
    Vu = fem.VectorBasis(mesh, fem.ElementTri(2, 4))
    Vp = fem.Basis(mesh, fem.ElementTri(1, 4))
    f = Vu.integrate_linear_form(load)

    u_ref, p_ref, info_ref = compiled_stokes_solver(
        Vu, Vp, a_form, div_form, tol=1e-9, inner_tol=1e-11
    )(f)
    assert bool(info_ref.converged)

    for kw in (
        dict(a_scalar_form=a_scalar),
        dict(a_scalar_form=a_scalar, precondition="jacobi"),
        dict(precondition="agg_rbm"),
        dict(precondition="agg_comp"),
    ):
        u, p, info = compiled_stokes_solver(
            Vu, Vp, a_form, div_form, tol=1e-9, inner_tol=1e-11, **kw
        )(f)
        assert bool(info.converged), kw
        np.testing.assert_allclose(
            np.asarray(u), np.asarray(u_ref), atol=1e-7
        )
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(p_ref), atol=1e-6
        )

    with pytest.raises(ValueError, match="schur"):
        compiled_stokes_solver(
            Vu, Vp, a_form, div_form, method="minres",
            a_scalar_form=a_scalar,
        )
    Vu_rx = fem.VectorBasis(
        mesh, fem.ElementTri(2, 4), dirichlet_components=(0,)
    )
    with pytest.raises(ValueError, match="components"):
        compiled_stokes_solver(
            Vu_rx, Vp, a_form, div_form, a_scalar_form=a_scalar
        )


def test_pcg_cols_matches_per_column_pcg():
    """pcg_cols = m independent CG recurrences in lockstep: each column
    must land on the single-rhs pcg solution, with converged columns
    frozen (a widely-scaled rhs forces different per-column counts)."""
    from pytorch_fem_solver_tpu.ops.bsr import (
        bsr_matvec,
        bsr_matvec_cols,
        bsr_reduce,
        bsr_reduce_cols,
        bsr_values_from_local_symmetric,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.ops.solvers import pcg, pcg_cols

    mesh = fem.MeshTri(fem.unit_square(n=10))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))
    st = get_bsr_structure(V, max_b=8)
    local = V.integrate_bilinear_form_local(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    values = bsr_values_from_local_symmetric(st, local)
    b1 = bsr_reduce(st, V.integrate_linear_form(lambda b: b.v)[:, 0])
    rng = np.random.default_rng(0)
    b2 = bsr_reduce(
        st,
        jnp.asarray(rng.normal(size=(V.n_dofs,)) * 1e3).astype(b1.dtype),
    )
    B = jnp.stack([b1, b2], axis=1)

    # multi-column matvec == per-column matvec
    Y = bsr_matvec_cols(st, values, B)
    for c, bc in enumerate((b1, b2)):
        np.testing.assert_allclose(
            np.asarray(Y[:, c]),
            np.asarray(bsr_matvec(st, values, bc)),
            rtol=1e-12,
        )
    # the cols reduce matches the per-column reduce
    full2 = jnp.stack(
        [jnp.asarray(rng.normal(size=(V.n_dofs,))) for _ in range(2)], axis=1
    )
    np.testing.assert_allclose(
        np.asarray(bsr_reduce_cols(st, full2)[:, 1]),
        np.asarray(bsr_reduce(st, full2[:, 1])),
        rtol=0,
    )

    mv = lambda x: bsr_matvec(st, values, x)
    X, info = pcg_cols(
        lambda Z: bsr_matvec_cols(st, values, Z), B, tol=1e-10
    )
    assert bool(info.converged)
    for c, bc in enumerate((b1, b2)):
        x_ref, info_ref = pcg(mv, bc, tol=1e-10)
        scale = float(jnp.abs(x_ref).max())
        assert (
            float(jnp.abs(X[:, c] - x_ref).max()) <= 1e-9 * max(scale, 1.0)
        ), c
