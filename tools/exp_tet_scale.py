"""3D tet-tier TPU scale probe: Poisson on unit_cube(n) via compiled_solver.

Measures host topology build, assembly+solve wall time (host-copy
synchronized — block_until_ready does not sync on axon) and PCG iteration
counts for the production one-jit BSR path with the auto preconditioner.

Usage: python tools/exp_tet_scale.py [n ...]   (defaults 32 48 64)
Knobs: TET_PRECOND (auto|jacobi, default auto), TET_TOL (1e-6),
TET_REPEATS (3), TET_MAX_B (int|none|auto), TET_VALUES_DTYPE (bf16).
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

PRECOND = os.environ.get("TET_PRECOND", "auto")
TOL = float(os.environ.get("TET_TOL", "1e-6"))
REPEATS = int(os.environ.get("TET_REPEATS", "3"))
MAX_B = os.environ.get("TET_MAX_B", "auto")  # int, "none" (uncapped), "auto"
MAX_B = {"none": None, "auto": "auto"}.get(MAX_B.lower(), MAX_B)
MAX_B = int(MAX_B) if isinstance(MAX_B, str) and MAX_B not in ("auto",) else MAX_B
VALUES_DTYPE = os.environ.get("TET_VALUES_DTYPE", "")  # "" | bf16
PI = np.pi


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def load_form(basis):
    p = basis.integration_points
    return (
        3
        * PI**2
        * jnp.sin(PI * p[..., 0:1])
        * jnp.sin(PI * p[..., 1:2])
        * jnp.sin(PI * p[..., 2:3])
        * basis.v
    )


def run(n):
    t0 = time.perf_counter()
    mesh = MeshTet(unit_cube(n))
    t_mesh = time.perf_counter() - t0

    t0 = time.perf_counter()
    V = fem.Basis(mesh, ElementTet(1, integration_order=2))
    t_basis = time.perf_counter() - t0
    n_dofs = int(V._coords4global_dofs.shape[-2])

    # one jitted program for the whole assemble+solve (eager dispatch over
    # the axon tunnel costs ~31 ms RTT per op)
    t0 = time.perf_counter()
    kw = {} if MAX_B == "auto" else {"max_b": MAX_B}
    solve = V.compiled_solver(
        stiffness_form, load_form, tol=TOL, precondition=PRECOND,
        values_dtype=jnp.bfloat16 if VALUES_DTYPE == "bf16" else None, **kw
    )
    t_struct = time.perf_counter() - t0

    # warmup (compile) + timed repeats; np.asarray forces axon sync
    u, info = solve()
    _ = np.asarray(u)
    times = []
    for _i in range(REPEATS):
        t0 = time.perf_counter()
        u, info = solve()
        _ = np.asarray(u)
        times.append(time.perf_counter() - t0)
    it = int(info.iterations)
    med = sorted(times)[len(times) // 2]
    print(
        f"n={n:4d} dofs={n_dofs:9d} cells={mesh.n_cells:9d} "
        f"mesh={t_mesh:6.1f}s basis={t_basis:5.1f}s struct={t_struct:5.1f}s "
        f"solve={med:7.3f}s (spread {min(times):.3f}-{max(times):.3f}) "
        f"iters={it} converged={bool(info.converged)} "
        f"s/iter={med / max(it, 1) * 1e3:7.2f}ms",
        flush=True,
    )


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [32, 48, 64]
    print(f"platform={jax.devices()[0].platform} precond={PRECOND} tol={TOL} max_b={MAX_B} values={VALUES_DTYPE or 'f32'}")
    for n in ns:
        run(n)
