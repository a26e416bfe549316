"""One-off: n=100 (1.03M DOFs) 3D solve under max_b and values-dtype variants.

Builds the mesh/basis once, then times compiled_solver configs back to back
on the same structures (separate BSR structures per max_b, cached on the
basis). Records the winner for docs/performance.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

PI = np.pi
N = int(os.environ.get("TET_N", "100"))


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def load_form(basis):
    p = basis.integration_points
    return (
        3 * PI**2
        * jnp.sin(PI * p[..., 0:1])
        * jnp.sin(PI * p[..., 1:2])
        * jnp.sin(PI * p[..., 2:3])
        * basis.v
    )


t0 = time.perf_counter()
mesh = MeshTet(unit_cube(N))
print(f"mesh: {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
V = fem.Basis(mesh, ElementTet(1, 2))
print(f"basis: {time.perf_counter() - t0:.1f}s", flush=True)

u_ref = None
for max_b, vdt in [(8, None), (24, None), (24, jnp.bfloat16)]:
    t0 = time.perf_counter()
    solve = V.compiled_solver(
        stiffness_form, load_form, tol=1e-6, max_b=max_b, values_dtype=vdt
    )
    t_struct = time.perf_counter() - t0
    u, info = solve()
    _ = np.asarray(u)  # compile+warmup sync
    times = []
    for _i in range(3):
        t0 = time.perf_counter()
        u, info = solve()
        u_host = np.asarray(u)
        times.append(time.perf_counter() - t0)
    med = sorted(times)[1]
    it = int(info.iterations)
    if u_ref is None:
        u_ref = u_host
    rel = float(
        np.linalg.norm(u_host - u_ref) / max(np.linalg.norm(u_ref), 1e-30)
    )
    print(
        f"max_b={max_b} values={'bf16' if vdt is not None else 'f32'}: "
        f"struct={t_struct:6.1f}s solve={med:6.3f}s iters={it} "
        f"s/iter={med / max(it, 1) * 1e3:6.2f}ms rel_vs_first={rel:.2e}",
        flush=True,
    )
