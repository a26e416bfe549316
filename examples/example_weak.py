"""RVPINN for 2D Poisson: residual in the FEM test space, loss r^T G^{-1} r.

Port of /root/reference/examples/example_weak.py:1-212 to the TPU-native
framework: the entire training step (quadrature residual assembly + Gram
preconditioning + double backward) compiles into one jitted step.
"""

import os

import common
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem

EPOCHS = int(os.environ.get("FEM_EPOCHS", 2000))

# ---------------------- Neural network ----------------------

nn = fem.FeedForwardNeuralNetwork(
    input_dimension=2,
    output_dimension=1,
    nb_hidden_layers=4,
    neurons_per_layers=15,
    boundary_condition_modifier=common.boundary_constrain,
)

# ---------------------- FEM test space ----------------------

mesh = fem.MeshTri(fem.unit_square(max_area=0.5**8))
elements = fem.ElementTri(polynomial_order=1, integration_order=4)
discrete_basis = fem.Basis(mesh, elements)

# r -> G^{-1} r through a Cholesky factor (FEM_GRAM=pcg switches to the
# matrix-free solver — O(nnz) memory, for test spaces too large to hold a
# dense Gram; both are differentiable inside the jitted step)
gram_solve = discrete_basis.gram_solver(
    common.stiffness_form, method=os.environ.get("FEM_GRAM", "cholesky")
)

exact_norm = jnp.sqrt(discrete_basis.integrate_functional(common.h1_exact).sum())

# ---------------------- Training ----------------------


def training_step(neural_network):
    residual_vector = discrete_basis.reduce(
        discrete_basis.integrate_linear_form(
            common.residual_form, neural_network.gradient
        )
    )
    loss = (residual_vector.T @ gram_solve(residual_vector))[0, 0]
    relative_loss = jnp.sqrt(loss) / exact_norm**2
    h1_error = jnp.sqrt(
        discrete_basis.integrate_functional(
            common.h1_norm, neural_network, neural_network.gradient
        ).sum()
    )
    return loss, relative_loss, h1_error / exact_norm


model = fem.Model(
    neural_network=nn,
    training_step=training_step,
    epochs=EPOCHS,
    optimizer_kwargs={"lr": 0.001},
)

model.train()
nn = model.load_optimal_parameters()

loss_hist, _, acc_hist = model.get_training_history()
print(f"final loss {loss_hist[-1]:.6e}  relative H1 error {acc_hist[-1]:.4f}")

# ---------------------- Plotting ----------------------

h1_cellwise = jnp.sqrt(
    discrete_basis.integrate_functional(common.h1_norm, nn, nn.gradient)
)
fig, axis, plt = common.plot_cellwise(discrete_basis, h1_cellwise, r"$H^1$ error")
model.plot_training_history(
    plot_names={
        "loss": r"$\mathcal{L}(u_\theta)$",
        "validation": r"$\sqrt{\mathcal{L}}/\|u\|_U$",
        "accuracy": r"$\|u-u_\theta\|_U/\|u\|_U$",
        "title": "MF-RVPINNs",
    }
)
common.maybe_show(plt)
