"""VPINN on the seven-fractures benchmark network.

The BASELINE config list names "seven-fractures DFN with VPINN neural trial
space" as a target workload; the reference stages the geometry but has no
script for it. Here: a 3D-input network is trained against the glued P1 test
space of the full benchmark network (-Δu = 1, homogeneous Dirichlet on all
outer boundaries), with the FEM solution of the same system as the accuracy
oracle.
"""

import os

import common
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.utils import build_benchmark_network

EPOCHS = int(os.environ.get("FEM_EPOCHS", 2000))
H = float(os.environ.get("FEM_H", 0.25))

mesh = build_benchmark_network(h=H)
V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
print(f"h={H}: {mesh.n_fractures} fractures, {mesh.n_cells} cells, "
      f"{V.n_dofs} global DOFs")

# ---------------------- FEM oracle -----------------------------------

a_form = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
l_form = lambda b: b.v

u_fem = V.solve_iterative(
    V.integrate_bilinear_form_local(a_form),
    V.integrate_linear_form(l_form),
    tol=1e-10,
    precondition="two_level",
)
I_fem, I_fem_grad = V.interpolate(V, u_fem)
fem_norm = jnp.sqrt(
    V.integrate_functional(
        lambda b, u, g: u**2 + (g**2).sum(-1, keepdims=True), I_fem, I_fem_grad
    ).sum()
)

# ---------------------- Neural trial function ------------------------


# A strong-BC modifier cannot vanish on interior fracture rims (e.g. the
# z = +-1 fractures end inside the box), so Dirichlet data is imposed
# weakly: a penalty on the network values at the boundary DOFs.
nn = fem.FeedForwardNeuralNetwork(
    input_dimension=3,
    output_dimension=1,
    nb_hidden_layers=4,
    neurons_per_layers=24,
    final_layer_scale=0.05,
)

markers = np.asarray(mesh["global", "markers"])[:, 0]
boundary_nodes = jnp.asarray(
    np.asarray(mesh["global", "vertices_3d"])[markers == 1]
)
BC_WEIGHT = float(os.environ.get("FEM_BC_WEIGHT", 50.0))


def residual(basis, net):
    pts = basis.integration_points
    return basis.v - (basis.v_grad @ jnp.matrix_transpose(net.gradient(pts)))


GRAM = os.environ.get("FEM_GRAM", "cholesky")
gram_solve = V.gram_solver(a_form, method=GRAM)


def h1_error_vs_fem(basis, net):
    pts = basis.integration_points
    cell_frac = basis.mesh["cells", "fracture"][:, 0]
    jac = basis.mesh["fracture_map", "jacobian"][cell_frac][:, None]
    inv = basis.mesh["fracture_map", "inv_jacobian"][cell_frac][:, None]
    tangent = net.gradient(pts) @ (jac @ inv)
    return (net(pts) - I_fem) ** 2 + ((tangent - I_fem_grad) ** 2).sum(
        -1, keepdims=True
    )


if GRAM == "pcg":
    # stateful warm-start protocol: the previous epoch's Gram iterate
    # seeds the matrix-free PCG (gradient-free; measured 66.4 -> 44.9
    # ms/epoch on chip at h=0.1, docs/performance.md round 5)
    def training_step(net, x_prev):
        r = V.reduce(V.integrate_linear_form(residual, net))
        x = gram_solve(r, x_prev)
        weak = (r.T @ x)[0, 0]
        bc = jnp.mean(net(boundary_nodes) ** 2)
        loss = weak + BC_WEIGHT * bc
        h1 = jnp.sqrt(V.integrate_functional(h1_error_vs_fem, net).sum())
        return (loss, jnp.sqrt(weak) / fem_norm, h1 / fem_norm), x

    state0 = jnp.zeros(
        V.reduce(jnp.zeros((V.n_dofs, 1), dtype=fem_norm.dtype)).shape,
        dtype=fem_norm.dtype,
    )
else:

    def training_step(net):
        r = V.reduce(V.integrate_linear_form(residual, net))
        weak = (r.T @ gram_solve(r))[0, 0]
        bc = jnp.mean(net(boundary_nodes) ** 2)
        loss = weak + BC_WEIGHT * bc
        h1 = jnp.sqrt(V.integrate_functional(h1_error_vs_fem, net).sum())
        return loss, jnp.sqrt(weak) / fem_norm, h1 / fem_norm

    state0 = None

model = fem.Model(
    neural_network=nn,
    training_step=training_step,
    epochs=EPOCHS,
    optimizer_kwargs={"lr": 1e-3},
    training_state0=state0,
)
model.train()
model.load_optimal_parameters()
loss_hist, _, acc_hist = model.get_training_history()
print(
    f"final loss {loss_hist[-1]:.6e}  relative H1 distance to FEM "
    f"{acc_hist[-1]:.4f}"
)
