"""RVPINN loss combined with the a-posteriori jump/bulk estimator.

Port of /root/reference/examples/example_weak_plus_posterri.py:120-253:
loss = r^T G^{-1} r + h_T^2 (f + Δu_θ)^2 + h_E (⟦∇u_θ·n⟧)^2.
"""

import os

import common
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem

EPOCHS = int(os.environ.get("FEM_EPOCHS", 1000))

nn = fem.FeedForwardNeuralNetwork(
    2, 1, nb_hidden_layers=4, neurons_per_layers=15,
    boundary_condition_modifier=common.boundary_constrain,
)

mesh = fem.MeshTri(fem.unit_square(max_area=0.5**8))
V = fem.Basis(mesh, fem.ElementTri(1, 4))
V_edges = fem.InteriorEdgesBasis(mesh, fem.ElementLine(1, 2))

jump, h_T, h_E, n_E = common.make_edge_jump(V, V_edges)

gram_solve = V.gram_solver(
    common.stiffness_form, method=os.environ.get("FEM_GRAM", "cholesky")
)
exact_norm = jnp.sqrt(V.integrate_functional(common.h1_exact).sum())



def bulk(basis, triangle_size, net):
    x, y = common.split_xy(basis.integration_points)
    return triangle_size**2 * (
        common.rhs(x, y) + net.laplacian(basis.integration_points)
    ) ** 2


def training_step(net):
    r = V.reduce(V.integrate_linear_form(common.residual_form, net.gradient))
    weak_loss = (r.T @ gram_solve(r))[0, 0]
    estimator = (
        V_edges.integrate_functional(jump, n_E, h_E, net).sum()
        + V.integrate_functional(bulk, h_T, net).sum()
    )
    loss = weak_loss + estimator
    h1_error = jnp.sqrt(
        V.integrate_functional(common.h1_norm, net, net.gradient).sum()
    )
    return loss, jnp.sqrt(loss) / exact_norm**2, h1_error / exact_norm


model = fem.Model(
    neural_network=nn, training_step=training_step, epochs=EPOCHS,
    optimizer_kwargs={"lr": 0.001},
)
model.train()
loss_hist, _, acc_hist = model.get_training_history()
print(f"final loss {loss_hist[-1]:.6e}  relative H1 error {acc_hist[-1]:.4f}")
