"""Two-level preconditioners: SPD-validity, same solution, fewer iterations."""

import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.ops.precondition import (
    build_smoothed_two_level,
    build_two_level,
    spatial_aggregates,
)
from pytorch_fem_solver_tpu.ops.solvers import pcg
from pytorch_fem_solver_tpu.ops.sparse import (
    build_ell_structure,
    ell_diagonal,
    ell_matvec,
    ell_values_from_local,
)


def setup_problem(n=24):
    mesh = fem.MeshTri(fem.unit_square(n=n))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    local = V.integrate_bilinear_form_local(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    inner = np.asarray(V._basis_parameters["inner_dofs"])
    st = build_ell_structure(
        np.asarray(V._global_dofs4elements), V.n_dofs, inner, max_k=7
    )
    vals = ell_values_from_local(st, local)
    diag = ell_diagonal(st, vals)
    b = V.reduce(V.integrate_linear_form(lambda b_: b_.v))[..., 0]
    coords = np.asarray(V._coords4global_dofs)[inner]
    return st, vals, diag, b, coords


def test_spatial_aggregates_cover_and_bound():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(500, 3))
    agg = spatial_aggregates(pts, leaf=16)
    counts = np.bincount(agg)
    assert counts.sum() == 500
    assert counts.max() <= 16
    assert (counts > 0).all()


def test_smoothed_two_level_cuts_iterations():
    st, vals, diag, b, coords = setup_problem()
    mv = lambda x: ell_matvec(st, vals, x)

    x_j, info_j = pcg(mv, b, precond_diag=diag, tol=1e-10)
    M = build_smoothed_two_level(st, vals, coords, leaf=16, max_row_nnz=3)
    x_t, info_t = pcg(mv, b, precond=M, tol=1e-10)

    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_j), atol=1e-8)
    assert int(info_t.iterations) < int(info_j.iterations), (
        int(info_t.iterations),
        int(info_j.iterations),
    )


def test_smoothed_two_level_apply_is_spd():
    st, vals, diag, _, coords = setup_problem(n=8)
    M = build_smoothed_two_level(st, vals, coords, leaf=8)
    n = st.n_inner
    # materialize M^{-1} and check symmetry + positive definiteness
    eye = np.eye(n)
    Minv = np.stack([np.asarray(M(jnp.asarray(eye[i]))) for i in range(n)])
    np.testing.assert_allclose(Minv, Minv.T, atol=1e-9)
    eigs = np.linalg.eigvalsh(0.5 * (Minv + Minv.T))
    assert eigs.min() > 0


def test_device_two_level_setup_matches():
    """Fully-device setup path: same solution, comparable iteration cut."""
    import jax

    from pytorch_fem_solver_tpu.ops.precondition import (
        build_two_level_structure,
        two_level_from_values,
    )

    st, vals, diag, b, coords = setup_problem(n=20)
    mv = lambda x: ell_matvec(st, vals, x)
    x_j, info_j = pcg(mv, b, precond_diag=diag, tol=1e-10)

    tl = build_two_level_structure(st, coords, leaf=16, kp=4)
    M = jax.jit(lambda v, d: two_level_from_values(tl, st, v, d))(vals, diag)
    x_t, info_t = pcg(mv, b, precond=M, tol=1e-10)

    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_j), atol=1e-8)
    assert bool(info_t.converged)
    # the coarse correction pays off at scale (see the scipy-variant test);
    # at this tiny size just require it not to blow up the iteration count
    assert int(info_t.iterations) <= 2 * int(info_j.iterations)


def test_plain_two_level_matches_jacobi_solution():
    st, vals, diag, b, coords = setup_problem(n=12)
    mv = lambda x: ell_matvec(st, vals, x)
    M = build_two_level(st, vals, diag, block=64)
    x_j, _ = pcg(mv, b, precond_diag=diag, tol=1e-10)
    x_t, info = pcg(mv, b, precond=M, tol=1e-10)
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x_j), atol=1e-8)
    assert bool(info.converged)


def test_agg_block_two_level_matches_and_converges():
    """The aggregate-block smoother assembles the true (g, g) diagonal
    blocks (checked against the dense assembled operator) and the
    preconditioned solve matches the plain two-level solution."""
    from pytorch_fem_solver_tpu.ops.bsr import (
        bsr_diagonal,
        bsr_expand,
        bsr_matvec,
        bsr_reduce,
        bsr_values_from_local,
        get_bsr_structure,
    )
    from pytorch_fem_solver_tpu.ops.precondition import (
        agg_block_two_level_from_values,
        batched_small_inv,
        build_agg_block_table,
    )
    from pytorch_fem_solver_tpu.ops.solvers import pcg

    mesh = fem.MeshTri(fem.unit_square(max_area=0.5**9))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))

    def a_form(b_):
        return b_.v_grad @ jnp.matrix_transpose(b_.v_grad)

    local = V.integrate_bilinear_form_local(a_form)
    b = V.integrate_linear_form(lambda b_: b_.v)

    st = get_bsr_structure(V, max_b=4)  # force a tier-2 spill
    values = bsr_values_from_local(st, local)
    diag = bsr_diagonal(st, values)
    precond = agg_block_two_level_from_values(st, values, diag)
    g = precond.g

    # the inverse blocks really invert the permuted operator's aggregate
    # diagonal blocks: rebuild those densely from the reduced matrix
    A = np.asarray(V.reduce(V.integrate_bilinear_form(a_form)))
    n_inner = st.n_inner
    perm_A = A[np.ix_(st.perm, st.perm)]
    dense_pad = np.eye(st.n_pad)
    dense_pad[:n_inner, :n_inner] = perm_A
    for a0 in range(0, st.n_pad, g):
        blk = dense_pad[a0 : a0 + g, a0 : a0 + g]
        inv_ref = np.linalg.inv(blk)
        np.testing.assert_allclose(
            np.asarray(precond.inv_agg[a0 // g]), inv_ref, atol=1e-8
        )

    b_pad = bsr_reduce(st, b)
    x, info = pcg(
        lambda v: bsr_matvec(st, values, v),
        b_pad,
        precond=precond,
        tol=1e-12,
    )
    u = V.solution_tensor() + bsr_expand(st, x, V.n_dofs)
    u_ref = V.solve_iterative(local, b, tol=1e-12, precondition="two_level")
    np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref), atol=1e-9)
    assert bool(info.converged)


def test_solve_iterative_preserves_basis_pytree_structure():
    """Preconditioner setup caches host tables on the basis; every such
    attribute must be excluded from the pytree flatten, or the first solve
    silently changes the basis treedef and forces a recompile of every
    jitted function that takes the basis as an argument."""
    import jax

    mesh = fem.MeshTri(fem.unit_square(n=12))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    local = V.integrate_bilinear_form_local(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    b = V.integrate_linear_form(lambda b_: b_.v)
    before = jax.tree_util.tree_structure(V)
    for method, precond in (
        ("bsr", "two_level"),
        ("bsr", "agg_block"),
        ("bsr", "jacobi"),
        ("ell", "two_level"),
    ):
        V.solve_iterative(
            local, b, method=method, precondition=precond, tol=1e-10
        )
        after = jax.tree_util.tree_structure(V)
        assert before == after, (
            f"basis pytree changed after solve_iterative({method}, {precond})"
        )


def test_spd_inverse_spd_and_indefinite_fallback():
    """spd_inverse matches the true inverse on SPD input (Cholesky route)
    AND on a symmetric-indefinite input, where the Cholesky factor is NaN
    and the guarded LU fallback must kick in — compiled_newton symmetrizes
    non-symmetric Jacobian coarse matrices, and 0.5*(C+C^T) can be
    indefinite (an all-NaN coarse inverse poisons every Krylov iterate)."""
    import jax

    from pytorch_fem_solver_tpu.ops.precondition import spd_inverse

    rng = np.random.default_rng(5)
    q, _ = np.linalg.qr(rng.normal(size=(12, 12)))

    spd = q @ np.diag(rng.uniform(0.5, 2.0, size=12)) @ q.T
    out = np.asarray(spd_inverse(jnp.asarray(spd)))
    np.testing.assert_allclose(out, np.linalg.inv(spd), rtol=0, atol=1e-10)

    eigs = rng.uniform(0.5, 2.0, size=12)
    eigs[::3] *= -1.0  # indefinite: Cholesky fills the factor with NaN
    indef = q @ np.diag(eigs) @ q.T
    out = np.asarray(spd_inverse(jnp.asarray(indef)))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, np.linalg.inv(indef), rtol=0, atol=1e-10)

    # and under jit (the lax.cond path inside a traced program)
    out_jit = np.asarray(jax.jit(spd_inverse)(jnp.asarray(indef)))
    np.testing.assert_allclose(out_jit, out, rtol=0, atol=1e-12)
