"""Pure-FEM solve of the seven-fractures benchmark network.

The benchmark workload (BASELINE.md) as a plain user script: build the
seven-fractures DFN, assemble the P1 stiffness/load on the glued global
triangulation, solve with the hybrid-BSR block-Jacobi/aggregate PCG (the
TPU fast path), and report per-fracture solution statistics plus an
h-refinement consistency check. The reference stages this geometry but
ships no script for it (SURVEY.md §2); its closest analogue is the
2-fracture `example_fractures_fem.py` (reference examples/
example_fractures_fem.py:239-347), which `examples/example_fractures_fem.py`
ports 1:1.

Knobs: FEM_H (target edge length, default 0.1), FEM_SHOW_PLOTS=1 for a 3D
scatter of the solution.
"""

import os
import time

import common  # configures platform/dtype like the other examples
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.utils import build_benchmark_network

H = float(os.environ.get("FEM_H", 0.1))

a_form = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
l_form = lambda b: b.v


def solve_at(h):
    mesh = build_benchmark_network(h=h)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    local = V.integrate_bilinear_form_local(a_form)
    b = V.integrate_linear_form(l_form)
    t0 = time.perf_counter()
    u = V.solve_iterative(local, b, tol=1e-10, precondition="two_level")
    u_host = np.asarray(u)  # force sync for honest timing
    dt = time.perf_counter() - t0
    print(
        f"h={h}: {mesh.n_fractures} fractures, {mesh.n_cells} cells, "
        f"{V.n_dofs} DOFs, assemble+solve {dt:.2f}s (first call includes "
        f"jit compile), max u = {u_host.max():.6f}"
    )
    return mesh, V, u


mesh, V, u = solve_at(H)

# per-fracture statistics: where does the pressure concentrate?
u_np = np.asarray(u)[:, 0]
vert_fracture = np.asarray(mesh["vertices", "fracture"])[:, 0]
vert_global = np.asarray(mesh["global", "ids"])[:, 0]  # per flat vertex
for f in range(mesh.n_fractures):
    vals = u_np[vert_global[vert_fracture == f]]
    print(
        f"  fracture {f}: mean u = {vals.mean():.6f}  max u = {vals.max():.6f}"
    )

# consistency: the coarse solution interpolated is close to the fine one in
# the interior (O(h^2) in L2 for P1) — a cheap sanity check that refinement
# converges on this geometry
mesh2, V2, u2 = solve_at(H / 2)
m1 = float(np.asarray(u).max())
m2 = float(np.asarray(u2).max())
rel = abs(m1 - m2) / max(abs(m2), 1e-30)
print(f"max-u change under refinement: {rel:.3e} (expect -> 0 with h)")

if common.env_flag("FEM_SHOW_PLOTS"):
    import matplotlib.pyplot as plt

    coords3d = np.asarray(mesh["global", "vertices_3d"])
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    p = ax.scatter(
        coords3d[:, 0], coords3d[:, 1], coords3d[:, 2], c=u_np, s=4, cmap="viridis"
    )
    fig.colorbar(p, label="u")
    ax.set_title(f"Seven-fractures DFN, -Δu = 1 (h={H})")
    plt.show()
