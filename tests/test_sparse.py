"""ELL sparse operator: exact agreement with dense assembly."""

import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.ops.sparse import (
    build_ell_structure,
    ell_diagonal,
    ell_matvec,
    ell_values_from_local,
    reduced_ell_operator,
)


def a_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def test_ell_matches_dense_unit_square():
    mesh = fem.MeshTri(fem.unit_square(n=9))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    A = np.asarray(V.reduce(V.integrate_bilinear_form(a_form)))
    local = V.integrate_bilinear_form_local(a_form)

    matvec, diag = reduced_ell_operator(V, local)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=A.shape[0]))
    np.testing.assert_allclose(np.asarray(matvec(x)), A @ np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(diag), np.diag(A), atol=1e-12)

    # structure is cached on the basis (keyed by max_k): the second call
    # must REUSE the layout, not rebuild it
    assert len(V._ell_structures) == 1
    (cached,) = V._ell_structures.values()
    matvec2, _ = reduced_ell_operator(V, local)
    assert len(V._ell_structures) == 1
    assert next(iter(V._ell_structures.values())) is cached
    np.testing.assert_allclose(
        np.asarray(matvec2(x)), np.asarray(matvec(x)), atol=0
    )


def test_ell_on_fracture_network():
    f1 = [[-1, 0, 0], [1, 0, 0], [1, 1, 0], [-1, 1, 0]]
    f2 = [[0, 0, -1], [0, 0, 1], [0, 1, 1], [0, 1, -1]]
    from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network

    mesh = build_fracture_network([f1, f2], h=0.25)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    A = np.asarray(V.reduce(V.integrate_bilinear_form(a_form)))
    local = V.integrate_bilinear_form_local(a_form)

    st = build_ell_structure(
        np.asarray(V._global_dofs4elements),
        V.n_dofs,
        np.asarray(V._basis_parameters["inner_dofs"]),
    )
    vals = ell_values_from_local(st, local)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=A.shape[0]))
    np.testing.assert_allclose(
        np.asarray(ell_matvec(st, vals, x)), A @ np.asarray(x), atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(ell_diagonal(st, vals)), np.diag(A), atol=1e-12
    )
