"""RVPINN + a-posteriori where the residual uses the FEM *interpolant* of the
NN gradient.

Port of /root/reference/examples/example_int_weak_plus_posterri.py:82-257:
instead of the exact NN gradient at quadrature points, the residual uses
I_h(∇u_θ) — the P1 interpolant built from nodal NN values — making the trial
function effectively live in the FEM space.
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

# closures: evaluate the P1 interpolant (and its gradient) of any function
# given by nodal values, at V's own quadrature points and at edge points
_, interp_self_grad = V.interpolate(V)
jump, h_T, h_E, n_E = common.make_edge_jump(V, V_edges)

gram_solve = V.gram_solver(
    common.stiffness_form, method=os.environ.get("FEM_GRAM", "cholesky")
)
exact_norm = jnp.sqrt(V.integrate_functional(common.h1_exact).sum())



def residual_interpolated(basis, net):
    """rhs * v - grad(I_h u_θ) . grad(v)."""
    x, y = common.split_xy(basis.integration_points)
    ih_grad = interp_self_grad(net)  # (T, 1, 1, 2)
    return common.rhs(x, y) * basis.v - (
        basis.v_grad @ jnp.matrix_transpose(ih_grad)
    )


def bulk(basis, triangle_size, net):
    x, y = common.split_xy(basis.integration_points)
    # I_h u_θ is piecewise linear: its laplacian vanishes elementwise
    return triangle_size**2 * common.rhs(x, y) ** 2


def training_step(net):
    r = V.reduce(V.integrate_linear_form(residual_interpolated, net))
    loss = (r.T @ gram_solve(r))[0, 0]
    loss = loss + V_edges.integrate_functional(jump, n_E, h_E, net).sum()
    loss = loss + V.integrate_functional(bulk, h_T, net).sum()
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
