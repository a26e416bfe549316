"""RVPINN with batched patch test spaces.

Port of /root/reference/examples/example_patches.py:1-270: B vertex-centered
criss-cross patches are batched local test spaces; the Gram inverses are a
batched (B, k, k) inverse and all local residuals assemble in one scatter.
Separate train/validation integration orders as in the reference.
"""

import os

import common
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem

EPOCHS = int(os.environ.get("FEM_EPOCHS", 1000))


def generate_patches_info(n):
    """Quadtree-like patch hierarchy over the unit square (reference :48-73)."""
    centers = [(0.5, 0.5)]
    radius = [0.5]
    for _ in range(n):
        new_centers, new_radius = [], []
        for (cx, cy), r in zip(centers, radius):
            nr = r / 2
            new_centers.extend(
                [(cx - nr, cy - nr), (cx - nr, cy + nr), (cx + nr, cy - nr), (cx + nr, cy + nr)]
            )
            new_radius.extend([nr] * 4)
        centers, radius = new_centers, new_radius
    return np.asarray(centers), np.asarray(radius)[:, None]


nn = fem.FeedForwardNeuralNetwork(
    2, 1, nb_hidden_layers=4, neurons_per_layers=15,
    use_xavier_initialization=True,
    boundary_condition_modifier=common.boundary_constrain,
)

centers, radius = generate_patches_info(3)
patches = fem.Patches(centers, radius)

mesh = fem.MeshTri(fem.unit_square(max_area=0.5**8))

discrete_basis = fem.PatchesBasis(patches, fem.ElementTri(1, 2))
validation_basis = fem.PatchesBasis(patches, fem.ElementTri(1, 4))
error_basis = fem.Basis(mesh, fem.ElementTri(1, 2))

gram_inverse = jnp.linalg.inv(
    discrete_basis.reduce(
        discrete_basis.integrate_bilinear_form(common.stiffness_form)
    )
)
validation_gram_inverse = jnp.linalg.inv(
    validation_basis.reduce(
        validation_basis.integrate_bilinear_form(common.stiffness_form)
    )
)
exact_norm = jnp.sqrt(error_basis.integrate_functional(common.h1_exact).sum())


def training_step(net):
    r = discrete_basis.reduce(
        discrete_basis.integrate_linear_form(common.residual_form, net.gradient)
    )  # (B, k, 1)
    loss = (jnp.matrix_transpose(r) @ (gram_inverse @ r)).sum()

    r_val = validation_basis.reduce(
        validation_basis.integrate_linear_form(common.residual_form, net.gradient)
    )
    val_loss = (
        jnp.matrix_transpose(r_val) @ (validation_gram_inverse @ r_val)
    ).sum()
    val_loss = jnp.sqrt(val_loss) / exact_norm**2

    h1_error = jnp.sqrt(
        error_basis.integrate_functional(common.h1_norm, net, net.gradient).sum()
    )
    return loss, val_loss, h1_error / exact_norm


model = fem.Model(
    neural_network=nn, training_step=training_step, epochs=EPOCHS,
    optimizer_kwargs={"lr": 0.001},
)
model.train()
loss_hist, _, acc_hist = model.get_training_history()
print(
    f"patches: B={patches.batch_size()[0]}  final loss {loss_hist[-1]:.6e}  "
    f"relative H1 error {acc_hist[-1]:.4f}"
)
