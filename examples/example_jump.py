"""A-posteriori-only training: bulk residual + interior-edge gradient jumps.

Port of /root/reference/examples/example_jump.py:1-230: the loss is the
estimator h_T^2 (f + Δu_θ)^2 + h_E (⟦∇u_θ·n⟧)^2 with the jump evaluated via
two-sided edge interpolation of the NN's nodal interpolant.
"""

import os

import common
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem

EPOCHS = int(os.environ.get("FEM_EPOCHS", 1000))

nn = fem.FeedForwardNeuralNetwork(
    input_dimension=2,
    output_dimension=1,
    nb_hidden_layers=5,
    neurons_per_layers=25,
    boundary_condition_modifier=common.boundary_constrain,
)

mesh = fem.MeshTri(fem.unit_square(max_area=0.5**8))
elements = fem.ElementTri(polynomial_order=1, integration_order=2)
elements_1d = fem.ElementLine(polynomial_order=1, integration_order=2)

V = fem.Basis(mesh, elements)
V_edges = fem.InteriorEdgesBasis(mesh, elements_1d)

jump, h_T, h_E, n_E = common.make_edge_jump(V, V_edges)


def rhs_term(basis, triangle_size, net):
    x, y = common.split_xy(basis.integration_points)
    return triangle_size**2 * (
        common.rhs(x, y) + net.laplacian(basis.integration_points)
    ) ** 2


exact_norm = jnp.sqrt(V.integrate_functional(common.h1_exact).sum())



def training_step(net):
    jump_term = V_edges.integrate_functional(jump, n_E, h_E, net).sum()
    bulk_term = V.integrate_functional(rhs_term, h_T, net).sum()
    loss = jump_term + bulk_term
    relative_loss = jnp.sqrt(loss) / exact_norm**2
    h1_error = jnp.sqrt(
        V.integrate_functional(common.h1_norm, net, net.gradient).sum()
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

h1_cellwise = jnp.sqrt(V.integrate_functional(common.h1_norm, nn, nn.gradient))
_, _, plt = common.plot_cellwise(V, h1_cellwise, r"$H^1$ error")
model.plot_training_history(
    plot_names={
        "loss": r"$\mathcal{L}(u_\theta)$",
        "validation": r"$\sqrt{\mathcal{L}}/\|u\|_U$",
        "accuracy": r"$\|u-u_\theta\|_U/\|u\|_U$",
        "title": "only a posteriori estimator",
    }
)
common.maybe_show(plt)
