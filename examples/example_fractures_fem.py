"""Pure-FEM solve on the 2-fracture DFN, with trace flux jumps.

Port of /root/reference/examples/example_fractures_fem.py:1-484: assemble on
the glued fracture basis, solve, evaluate the normal-gradient jump of the FEM
solution along the trace vs the analytic jump 2 y (1-y).
"""

import os

import common
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network

H = float(os.environ.get("FEM_H", 0.0625))

mesh = build_fracture_network(common.two_fracture_geometry(), h=H)
V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 4))
print(f"h={H}: {mesh.n_cells} cells on {mesh.n_fractures} fractures, "
      f"{V.n_dofs} global DOFs")


def a(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def l(basis):
    return common.dfn_rhs(basis.integration_points) * basis.v


A = V.integrate_bilinear_form(a)
b = V.integrate_linear_form(l)
u_h = V.solve(A, V.solution_tensor(), b)

# matrix-free PCG path gives the same solution without the dense matrix
u_pcg = V.solve_iterative(V.integrate_bilinear_form_local(a), b, tol=1e-12)
print("dense vs PCG max diff:", float(jnp.abs(u_h - u_pcg).max()))

I_u, I_u_grad = V.interpolate(V, u_h)
rel_h1 = jnp.sqrt(
    V.integrate_functional(common.dfn_h1_error, I_u, I_u_grad).sum()
    / V.integrate_functional(common.dfn_h1_exact).sum()
)
print(f"relative H1 error: {float(rel_h1):.5f}")

# ---- trace jumps of the normal flux ----------------------------------

V_edges = fem.InteriorEdgesNetworkBasis(mesh, fem.ElementLine(1, 2))
_, I_e_grad = V.interpolate(V_edges, u_h)

n_E = mesh["interior_edges", "normals_3d"][..., None, :, :]
jump_u_h = (I_e_grad[:, 0] * n_E).sum(-1) + (I_e_grad[:, 1] * -n_E).sum(-1)
jump_u_h = np.asarray(jump_u_h)[..., 0, 0]

trace_mask = np.asarray(mesh["interior_edges", "trace_mask"])[:, 0].astype(bool)
mids = np.asarray(mesh["interior_edges", "coordinates_3d"]).mean(axis=1)
y_mid = mids[trace_mask, 1]
order = np.argsort(y_mid)

analytic = 2.0 * y_mid * (1.0 - y_mid)
err = np.abs(np.abs(jump_u_h[trace_mask]) - analytic).max()
print(f"trace jump vs analytic 2y(1-y): max abs dev {err:.4f} (O(h) expected)")

if common.SHOW_PLOTS:
    import matplotlib.pyplot as plt

    plt.plot(y_mid[order], np.abs(jump_u_h[trace_mask])[order], "o-",
             label=r"$|[\![\nabla u_h \cdot n]\!]|$ (FEM)")
    plt.plot(y_mid[order], analytic[order], "--", label="2y(1-y) (exact)")
    plt.xlabel("y along trace")
    plt.legend()
    plt.show()
