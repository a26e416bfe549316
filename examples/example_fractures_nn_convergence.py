"""VPINN convergence sweep over refined DFN meshes, reusing one network.

Port of /root/reference/examples/example_fractures_nn_convergence.py:282-376:
train the same NN against progressively finer fracture test spaces; pickle
[dofs, H1] for compare_convergence.py.
"""

import os
import pathlib
import pickle

import common
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network

LEVELS = int(os.environ.get("FEM_LEVELS", 3))
EPOCHS = int(os.environ.get("FEM_EPOCHS", 800))


boundary_modifier = common.dfn_boundary_modifier


nn = fem.FeedForwardNeuralNetwork(
    3, 1, nb_hidden_layers=4, neurons_per_layers=20,
    boundary_condition_modifier=boundary_modifier,
    final_layer_scale=0.05,
)

dofs_list, h1_list = [], []
h = 0.5
for level in range(LEVELS):
    mesh = build_fracture_network(common.two_fracture_geometry(), h=h)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 4))

    gram_solve = V.gram_solver(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad),
        method=os.environ.get("FEM_GRAM", "cholesky"),
    )
    exact_norm = jnp.sqrt(V.integrate_functional(common.dfn_h1_exact).sum())

    def residual(basis, net):
        pts = basis.integration_points
        return common.dfn_rhs(pts) * basis.v - (
            basis.v_grad @ jnp.matrix_transpose(net.gradient(pts))
        )

    def h1_err(basis, net):
        pts = basis.integration_points
        tangent = net.gradient(pts) @ common.tangential_projector(basis)
        return (net(pts) - common.dfn_exact(pts)) ** 2 + (
            (tangent - common.dfn_exact_grad(pts)) ** 2
        ).sum(-1, keepdims=True)

    def training_step(net, V=V, gram_solve=gram_solve, exact_norm=exact_norm,
                      residual=residual, h1_err=h1_err):
        r = V.reduce(V.integrate_linear_form(residual, net))
        loss = (r.T @ gram_solve(r))[0, 0]
        h1 = jnp.sqrt(V.integrate_functional(h1_err, net).sum())
        return loss, jnp.sqrt(loss) / exact_norm**2, h1 / exact_norm

    # reuse the same network across meshes (reference :316)
    model = fem.Model(
        neural_network=nn, training_step=training_step, epochs=EPOCHS,
        optimizer_kwargs={"lr": 0.001},
    )
    nn = model.train()

    loss_hist, _, acc = model.get_training_history()
    # record the accuracy of the best (snapshotted) epoch: the final epoch
    # can be a diverged step whose history entry is garbage
    import numpy as _np

    best = int(_np.nanargmin(_np.asarray(loss_hist)))
    dofs_list.append(V.n_dofs)
    h1_list.append(acc[best])
    print(f"level {level}: h={h:.3f} n_dofs={V.n_dofs} rel H1={acc[best]:.5f}")
    h *= 0.5

with open(pathlib.Path(__file__).parent / "H1_norm_converge_NN.pkl", "wb") as fh:
    pickle.dump([dofs_list, h1_list], fh)
print("pickled -> H1_norm_converge_NN.pkl")
