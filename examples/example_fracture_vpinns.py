"""Flagship: RVPINN on the 2-fracture DFN with the Ih(NN) interpolant variant.

Port of /root/reference/examples/example_fracture_vpinns.py:1-658: a 3D-input
neural network is the trial function over the whole fracture network; the
test space is the glued P1 FEM basis; the loss is the Gram-preconditioned
weak residual. Optionally the residual uses the FEM interpolant of the NN
(``FEM_USE_INTERPOLANT=1``), and the trained network's trace flux jump is
compared against the analytic jump.
"""

import os

import common
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network

EPOCHS = int(os.environ.get("FEM_EPOCHS", 2000))
H = float(os.environ.get("FEM_H", 0.125))
USE_INTERPOLANT = common.env_flag("FEM_USE_INTERPOLANT")


boundary_modifier = common.dfn_boundary_modifier


nn = fem.FeedForwardNeuralNetwork(
    input_dimension=3,
    output_dimension=1,
    nb_hidden_layers=4,
    neurons_per_layers=20,
    boundary_condition_modifier=boundary_modifier,
    final_layer_scale=0.05,
)

mesh = build_fracture_network(common.two_fracture_geometry(), h=H)
V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 4))
print(f"h={H}: {mesh.n_cells} cells, {V.n_dofs} global DOFs, "
      f"interpolant variant: {USE_INTERPOLANT}")

gram_solve = V.gram_solver(
    lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad),
    method=os.environ.get("FEM_GRAM", "cholesky"),
)
exact_norm = jnp.sqrt(V.integrate_functional(common.dfn_h1_exact).sum())

_, interp_self_grad = V.interpolate(V)


tangential_projector = common.tangential_projector


def residual(basis, net):
    pts = basis.integration_points
    if USE_INTERPOLANT:
        grad = interp_self_grad(net)  # tangential gradient of Ih(NN)
    else:
        # the test gradients v_grad are already tangential, so the dot with
        # the ambient NN gradient equals the dot with its projection
        grad = net.gradient(pts)
    return common.dfn_rhs(pts) * basis.v - (
        basis.v_grad @ jnp.matrix_transpose(grad)
    )


def h1_error_nn(basis, net):
    pts = basis.integration_points
    e = common.dfn_exact(pts)
    g = common.dfn_exact_grad(pts)
    tangent = net.gradient(pts) @ tangential_projector(basis)
    return (net(pts) - e) ** 2 + ((tangent - g) ** 2).sum(-1, keepdims=True)


def training_step(net):
    r = V.reduce(V.integrate_linear_form(residual, net))
    loss = (r.T @ gram_solve(r))[0, 0]
    h1_error = jnp.sqrt(V.integrate_functional(h1_error_nn, net).sum())
    return loss, jnp.sqrt(loss) / exact_norm**2, h1_error / exact_norm


model = fem.Model(
    neural_network=nn, training_step=training_step, epochs=EPOCHS,
    optimizer_kwargs={"lr": 0.001},
)
model.train()
nn = model.load_optimal_parameters()
loss_hist, _, acc_hist = model.get_training_history()
print(f"final loss {loss_hist[-1]:.6e}  relative H1 error {acc_hist[-1]:.4f}")

# ---- trace jump of Ih(NN) vs exact (reference :300-658 renders this) ----

V_edges = fem.InteriorEdgesNetworkBasis(mesh, fem.ElementLine(1, 2))
_, interp_edges_grad = V.interpolate(V_edges)
grad = interp_edges_grad(nn)
n_E = mesh["interior_edges", "normals_3d"][..., None, :, :]
jump = (grad[:, 0] * n_E).sum(-1) + (grad[:, 1] * -n_E).sum(-1)
jump = np.asarray(jump)[..., 0, 0]

trace_mask = np.asarray(mesh["interior_edges", "trace_mask"])[:, 0].astype(bool)
y_mid = np.asarray(mesh["interior_edges", "coordinates_3d"]).mean(axis=1)[
    trace_mask, 1
]
analytic = 2.0 * y_mid * (1.0 - y_mid)
dev = np.abs(np.abs(jump[trace_mask]) - analytic)
print(f"NN trace jump vs analytic: mean dev {dev.mean():.4f} max {dev.max():.4f}")

# ---- per-element relative H1 error map (reference :424-655 figure) ----

num = np.asarray(V.integrate_functional(h1_error_nn, nn)).reshape(-1)
den = np.asarray(V.integrate_functional(common.dfn_h1_exact)).reshape(-1)
cell_err = np.sqrt(num / np.where(np.abs(den) < 1e-10, 1.0, den))
print(f"per-element relative H1 error: max {cell_err.max():.4f} "
      f"mean {cell_err.mean():.4f}")

# interactive standalone WebGL export (the pyvista-parity render path:
# reference example_fracture_vpinns.py:300-658 renders these with pyvista
# windows; FEM_EXPORT_HTML=dir writes self-contained .html viewers instead)
if os.environ.get("FEM_EXPORT_HTML"):
    from pytorch_fem_solver_tpu.utils.html3d import export_network_html

    out_dir = os.environ["FEM_EXPORT_HTML"]
    u_nodes = np.asarray(nn(mesh["global", "vertices_3d"]))[:, 0]
    export_network_html(
        mesh, os.path.join(out_dir, "nn_solution.html"),
        vertex_values=u_nodes, title="NN solution on the fracture network",
    )
    export_network_html(
        mesh, os.path.join(out_dir, "relative_error.html"),
        cell_values=cell_err, title="per-element relative H1 error",
    )
    print(f"wrote interactive viewers to {out_dir}/")

if common.SHOW_PLOTS:
    from pytorch_fem_solver_tpu.utils.plotting import (
        plot_error_maps_per_fracture,
        plot_trace_profile,
    )

    plot_error_maps_per_fracture(
        mesh, cell_err, title="Relative error for NN solution"
    )
    ax = plot_trace_profile(mesh, jump, label="NN jump")
    ax.plot(
        np.sort(y_mid), 2.0 * np.sort(y_mid) * (1.0 - np.sort(y_mid)),
        "k--", label="analytic",
    )
    import matplotlib.pyplot as plt

    common.maybe_show(plt)
