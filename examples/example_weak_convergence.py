"""Pure-FEM h-refinement study on the unit square (log-log slope fit).

Port of /root/reference/examples/example_weak_convergence.py:95-144: solve the
sine Poisson problem on a refinement family, fit the H1-error decay rate vs
#DOFs (theory: rate -0.5 in #DOFs, i.e. O(h) for P1).
"""

import os

import common
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem

N_REFINEMENTS = int(os.environ.get("FEM_REFINEMENTS", 7))
POLY_ORDER = int(os.environ.get("FEM_POLY_ORDER", 1))

dofs_list, h1_list = [], []

triangulation = fem.unit_square(n=4)
for level in range(N_REFINEMENTS):
    mesh = fem.MeshTri(triangulation)
    V = fem.Basis(mesh, fem.ElementTri(POLY_ORDER, 4))

    A = V.integrate_bilinear_form(common.stiffness_form)
    b = V.integrate_linear_form(common.load_form)
    u = V.solve(A, V.solution_tensor(), b)

    uh, uh_grad = V.interpolate(V, u)
    h1_error = float(
        jnp.sqrt(
            V.integrate_functional(common.h1_error_of_fields, uh, uh_grad).sum()
        )
    )
    exact_norm = float(jnp.sqrt(V.integrate_functional(common.h1_exact).sum()))

    dofs_list.append(V.n_dofs)
    h1_list.append(h1_error / exact_norm)
    print(f"level {level}: n_dofs={V.n_dofs:7d}  rel H1 error={h1_list[-1]:.6e}")

    triangulation = fem.refine_uniform(triangulation)

slope = np.polyfit(np.log(dofs_list), np.log(h1_list), 1)[0]
print(f"fitted decay rate vs #DOFs: {slope:.3f} (theory {-POLY_ORDER / 2.0})")

if common.SHOW_PLOTS:
    import matplotlib.pyplot as plt

    plt.loglog(dofs_list, h1_list, "o-")
    plt.xlabel("# DOFs")
    plt.ylabel("relative H1 error")
    plt.title(f"P{POLY_ORDER} convergence, slope {slope:.3f}")
    plt.show()
