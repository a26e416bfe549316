"""RVPINN + a-posteriori on an exponential manufactured solution.

Port of /root/reference/examples/example_exponetial.py:70-307, with the
manufactured derivatives corrected: the reference's ``u_yy`` keeps a stale
1/50 scaling and drops a factor 2 (example_exponetial.py:92), and its
residual feeds +Δu where the weak form needs -Δu. Here
u = x y (1-x)(1-y)(e^x - 1) and f = -Δu are derived consistently.
"""

import os

import common
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem

EPOCHS = int(os.environ.get("FEM_EPOCHS", 1000))
C = 1.0  # exponential coefficient


def exact(pts):
    x, y = common.split_xy(pts)
    return x * y * (1 - x) * (1 - y) * (jnp.exp(C * x) - 1)


def exact_dx(pts):
    x, y = common.split_xy(pts)
    return y * (1 - y) * (
        (1 - 2 * x) * (jnp.exp(C * x) - 1) + x * (1 - x) * C * jnp.exp(C * x)
    )


def exact_dy(pts):
    x, y = common.split_xy(pts)
    return x * (1 - x) * (1 - 2 * y) * (jnp.exp(C * x) - 1)


def rhs(pts):
    """f = -Δu for u above."""
    x, y = common.split_xy(pts)
    e = jnp.exp(C * x)
    u_xx = y * (1 - y) * (
        -2 * (e - 1) + 2 * (1 - 2 * x) * C * e + x * (1 - x) * C**2 * e
    )
    u_yy = -2 * x * (1 - x) * (e - 1)
    return -(u_xx + u_yy)


def residual(basis, gradient):
    pts = basis.integration_points
    return rhs(pts) * basis.v - (
        basis.v_grad @ jnp.matrix_transpose(gradient(pts))
    )


def h1_exact(basis):
    pts = basis.integration_points
    return exact(pts) ** 2 + exact_dx(pts) ** 2 + exact_dy(pts) ** 2


def h1_norm(basis, net, gradient):
    pts = basis.integration_points
    dx, dy = jnp.split(gradient(pts), 2, axis=-1)
    return (
        (exact(pts) - net(pts)) ** 2
        + (exact_dx(pts) - dx) ** 2
        + (exact_dy(pts) - dy) ** 2
    )


nn = fem.FeedForwardNeuralNetwork(
    2, 1, nb_hidden_layers=4, neurons_per_layers=20,
    boundary_condition_modifier=common.boundary_constrain,
)

mesh = fem.MeshTri(fem.unit_square(max_area=0.5**8))
V = fem.Basis(mesh, fem.ElementTri(1, 4))
V_edges = fem.InteriorEdgesBasis(mesh, fem.ElementLine(1, 2))
jump, h_T, h_E, n_E = common.make_edge_jump(V, V_edges)

gram_solve = V.gram_solver(
    common.stiffness_form, method=os.environ.get("FEM_GRAM", "cholesky")
)
exact_norm = jnp.sqrt(V.integrate_functional(h1_exact).sum())



def bulk(basis, triangle_size, net):
    pts = basis.integration_points
    return triangle_size**2 * (rhs(pts) + net.laplacian(pts)) ** 2


def training_step(net):
    r = V.reduce(V.integrate_linear_form(residual, net.gradient))
    loss = (r.T @ gram_solve(r))[0, 0]
    loss = loss + V_edges.integrate_functional(jump, n_E, h_E, net).sum()
    loss = loss + V.integrate_functional(bulk, h_T, net).sum()
    h1_error = jnp.sqrt(V.integrate_functional(h1_norm, net, net.gradient).sum())
    return loss, jnp.sqrt(loss) / exact_norm**2, h1_error / exact_norm


model = fem.Model(
    neural_network=nn, training_step=training_step, epochs=EPOCHS,
    optimizer_kwargs={"lr": 0.001},
)
model.train()
loss_hist, _, acc_hist = model.get_training_history()
print(f"final loss {loss_hist[-1]:.6e}  relative H1 error {acc_hist[-1]:.4f}")
