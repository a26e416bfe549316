"""Non-homogeneous Dirichlet lifting + training divergence guard."""

import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem


def test_dirichlet_lift_exact_for_harmonic():
    """Laplace with u = x + 2y on the boundary: interior solution exact."""
    mesh = fem.MeshTri(fem.unit_square(n=6))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    A = V.integrate_bilinear_form(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    b = jnp.zeros((V.n_dofs, 1))

    coords = np.asarray(V._coords4global_dofs)
    g = jnp.asarray((coords[:, 0] + 2.0 * coords[:, 1]).reshape(-1, 1))

    u_bc, rhs = V.dirichlet_lift(A, b, g)
    u = V.solve(A, u_bc, rhs)
    np.testing.assert_allclose(np.asarray(u), np.asarray(g), atol=1e-12)


def test_training_survives_nan_loss():
    mesh = fem.MeshTri(fem.unit_square(n=3))
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    nn = fem.FeedForwardNeuralNetwork(2, 1, 1, 4)

    calls = {"n": 0}

    def training_step(net):
        pts = V.integration_points
        loss = V.integrate_functional(lambda b: net(pts) ** 2).sum()
        return loss + jnp.inf, loss, loss  # every step diverges

    model = fem.Model(
        neural_network=nn,
        training_step=training_step,
        epochs=30,
        progress_bar=False,
    )
    trained = model.train()  # must not raise, must terminate
    # guard tripped: training stopped early after repeated divergence
    assert len(model.get_training_history()[0]) < 30
    # every parameter leaf remains finite
    import jax

    for leaf in jax.tree_util.tree_leaves(trained):
        assert np.isfinite(np.asarray(leaf)).all()
