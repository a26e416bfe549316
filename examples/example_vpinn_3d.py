"""RVPINN for 3D Poisson on the unit cube (beyond the reference).

The reference's VPINN machinery is 2D-only by way of its mesh layer; here
the whole training stack is dimension-agnostic, so a 3D RVPINN is the 2D
one (`example_weak.py`) with a tetrahedral test space: the NN trial function
takes (x, y, z), the test functions are P1 hats on `MeshTet`, and the loss
is the Gram-preconditioned weak residual r^T G^{-1} r. Manufactured solution
u = sin(pi x) sin(pi y) sin(pi z).

Env knobs: FEM_EPOCHS (default 1500), FEM_N (test mesh resolution, default
8), FEM_GRAM (cholesky|pcg).
"""

import math
import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

EPOCHS = int(os.environ.get("FEM_EPOCHS", 1500))
N = int(os.environ.get("FEM_N", 8))
PI = math.pi


def boundary_constrain(inputs):
    x, y, z = inputs[..., 0:1], inputs[..., 1:2], inputs[..., 2:3]
    return x * (x - 1) * y * (y - 1) * z * (z - 1)


def exact(p):
    return (
        jnp.sin(PI * p[..., 0:1])
        * jnp.sin(PI * p[..., 1:2])
        * jnp.sin(PI * p[..., 2:3])
    )


def grad_exact(p):
    s, c = jnp.sin, jnp.cos
    x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    return jnp.concatenate(
        [
            PI * c(PI * x) * s(PI * y) * s(PI * z),
            PI * s(PI * x) * c(PI * y) * s(PI * z),
            PI * s(PI * x) * s(PI * y) * c(PI * z),
        ],
        axis=-1,
    )


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def residual_form(basis, gradient):
    pts = basis.integration_points
    return 3 * PI**2 * exact(pts) * basis.v - (
        basis.v_grad @ jnp.matrix_transpose(gradient(pts))
    )


def h1_exact(basis):
    pts = basis.integration_points
    return exact(pts) ** 2 + (grad_exact(pts) ** 2).sum(-1, keepdims=True)


def h1_norm(basis, neural_network, gradient):
    pts = basis.integration_points
    return (exact(pts) - neural_network(pts)) ** 2 + (
        (grad_exact(pts) - gradient(pts)) ** 2
    ).sum(-1, keepdims=True)


nn = fem.FeedForwardNeuralNetwork(
    input_dimension=3,
    output_dimension=1,
    nb_hidden_layers=4,
    neurons_per_layers=20,
    boundary_condition_modifier=boundary_constrain,
)

mesh = MeshTet(unit_cube(N))
discrete_basis = fem.Basis(mesh, ElementTet(1, integration_order=3))
gram_solve = discrete_basis.gram_solver(
    stiffness_form, method=os.environ.get("FEM_GRAM", "cholesky")
)
exact_norm = jnp.sqrt(discrete_basis.integrate_functional(h1_exact).sum())


def training_step(neural_network):
    residual_vector = discrete_basis.reduce(
        discrete_basis.integrate_linear_form(
            residual_form, neural_network.gradient
        )
    )
    loss = (residual_vector.T @ gram_solve(residual_vector))[0, 0]
    relative_loss = jnp.sqrt(loss) / exact_norm**2
    h1_error = jnp.sqrt(
        discrete_basis.integrate_functional(
            h1_norm, neural_network, neural_network.gradient
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
print(
    f"final loss {loss_hist[-1]:.6e}  relative H1 error {acc_hist[-1]:.4f}"
)
