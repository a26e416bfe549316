"""f64-grade Poisson solve on an f32 accelerator: iterative refinement.

Beyond-reference workload (the reference's only solve is a dense f64
torch.linalg.solve on CPU, torch_fem/basis/abstract_basis.py:177-195):
``basis.compiled_refined`` recovers that accuracy class on hardware whose
fast path is f32 — an f32 two-level-preconditioned PCG inner solver with
f64 residual recomputation between passes, all in one jitted program.

Run: python examples/example_refined_precision.py   (CPU f64 by default;
FEM_H controls resolution). Prints the TRUE f64 relative residual after
the f32 stage and after each refinement pass, plus the error vs the dense
x64 reference solve.
"""

import math
import os

import common  # noqa: F401  (forces the CPU x64 context like every example)
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem

N = int(os.environ.get("FEM_N", "64"))

mesh = fem.MeshTri(fem.rectangle(N, N))
V = fem.Basis(mesh, fem.ElementTri(1, 2))
print(f"mesh: {mesh.n_cells} cells, {V.n_dofs} DOFs")

a_form = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)


def load(b):
    x = b.integration_points[..., 0:1]
    y = b.integration_points[..., 1:2]
    return (
        2 * math.pi**2 * jnp.sin(math.pi * x) * jnp.sin(math.pi * y) * b.v
    )


# dense x64 solve: the accuracy class being matched
u_dense = V.solve(
    V.integrate_bilinear_form(a_form),
    V.solution_tensor(),
    V.integrate_linear_form(load),
)

solve = V.compiled_refined(a_form, load, refine=2, tol32=1e-6)
u, info = solve()

print("inner PCG iterations per stage:", np.asarray(info.inner_iterations))
for k, r in enumerate(np.asarray(info.residuals)):
    stage = "f32 solve" if k == 0 else f"refine pass {k}"
    print(f"  {stage:>14}: true f64 relative residual {r:.3e}")
print("refined vs dense x64 solve:", float(jnp.abs(u - u_dense).max()))
assert float(jnp.abs(u - u_dense).max()) < 1e-10
