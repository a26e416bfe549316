"""Sanity workload: train with the H1 error functional directly as the loss.

Port of /root/reference/examples/example_loss_is_error.py:100-177.
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

exact_norm = jnp.sqrt(V.integrate_functional(common.h1_exact).sum())


def training_step(net):
    h1_error_sq = V.integrate_functional(
        common.h1_norm, net, net.gradient
    ).sum()
    loss = h1_error_sq
    h1_error = jnp.sqrt(h1_error_sq)
    return loss, jnp.sqrt(loss) / exact_norm**2, h1_error / exact_norm


model = fem.Model(
    neural_network=nn, training_step=training_step, epochs=EPOCHS,
    optimizer_kwargs={"lr": 0.001},
)
model.train()
loss_hist, _, acc_hist = model.get_training_history()
print(f"final loss {loss_hist[-1]:.6e}  relative H1 error {acc_hist[-1]:.4f}")

model.plot_training_history(
    plot_names={
        "loss": "H1 error^2 (= loss)",
        "validation": "sqrt(loss)/||u||",
        "accuracy": "relative H1 error",
        "title": "loss is error",
    }
)
import matplotlib.pyplot as plt  # noqa: E402

common.maybe_show(plt)
