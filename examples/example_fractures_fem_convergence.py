"""h-convergence of the DFN FEM solve; pickles [dofs, H1] like the reference.

Port of /root/reference/examples/example_fractures_fem_convergence.py:195-253.
"""

import os
import pathlib
import pickle

import common
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network

LEVELS = int(os.environ.get("FEM_LEVELS", 5))

dofs_list, h1_list = [], []
h = 0.5
for level in range(LEVELS):
    mesh = build_fracture_network(common.two_fracture_geometry(), h=h)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 4))

    A_local = V.integrate_bilinear_form_local(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    b = V.integrate_linear_form(
        lambda b_: common.dfn_rhs(b_.integration_points) * b_.v
    )
    u = V.solve_iterative(A_local, b, tol=1e-12)

    I_u, I_u_grad = V.interpolate(V, u)
    rel_h1 = float(
        jnp.sqrt(
            V.integrate_functional(common.dfn_h1_error, I_u, I_u_grad).sum()
            / V.integrate_functional(common.dfn_h1_exact).sum()
        )
    )
    dofs_list.append(V.n_dofs)
    h1_list.append(rel_h1)
    print(f"level {level}: h={h:.4f} n_dofs={V.n_dofs:6d} rel H1={rel_h1:.6e}")
    h *= 0.5

slope = np.polyfit(np.log(dofs_list), np.log(h1_list), 1)[0]
print(f"fitted decay rate vs #DOFs: {slope:.3f} (theory -0.5)")

with open(pathlib.Path(__file__).parent / "H1_norm_converge_FEM.pkl", "wb") as fh:
    pickle.dump([dofs_list, h1_list], fh)
print("pickled -> H1_norm_converge_FEM.pkl")
