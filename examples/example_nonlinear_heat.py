"""Nonlinear transient heat: implicit Euler + compiled Newton per step.

Solves u_t = div((1 + u^2) grad u) on the unit square with u = 0 on the
boundary from a smooth bump initial condition. Each backward-Euler step is
the nonlinear problem

    R(u)[v] = int ((u - u_n)/dt) v + (1 + u^2) grad u . grad v dx = 0

solved by ONE compiled-Newton dispatch: the previous step enters as a jit
argument (`solve(u_n, uh_n)`), so every time step reuses the same XLA
program. The stiffening conductivity makes hot regions diffuse faster than
the linear equation — the printed energy history decays strictly and
faster than linear heat. The reference has neither nonlinear solves nor
time stepping.

Env knobs: FEM_STEPS (default 20), FEM_DT (default 2e-3), FEM_H (0.06).
"""

import math
import os

import common  # noqa: F401  (configures CPU/x64 example defaults)
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem

STEPS = int(os.environ.get("FEM_STEPS", 20))
DT = float(os.environ.get("FEM_DT", 2e-3))
H = float(os.environ.get("FEM_H", 0.06))


def initial(p):
    x, y = p[..., 0:1], p[..., 1:2]
    return jnp.sin(math.pi * x) * jnp.sin(math.pi * y)


def residual(b, u, ug, uh_prev):
    kappa = 1.0 + u**2
    return (
        (u - uh_prev) / DT * b.v
        + kappa * (b.v_grad * ug).sum(-1, keepdims=True)
    )


def main():
    mesh = fem.MeshTri(fem.unit_square(max_area=H * H / 2))
    V = fem.Basis(mesh, fem.ElementTri(1, 3))

    # nodal interpolant of the initial bump (boundary DOFs are 0 there)
    import numpy as np

    coords = np.asarray(V._coords4global_dofs)
    u = jnp.asarray(np.asarray(initial(coords)).reshape(-1, 1))

    solve = V.compiled_newton(residual, tol=1e-10)
    energy = lambda uh: float(
        V.integrate_functional(lambda b, s: s**2, uh).sum()
    )

    print(f"nonlinear heat, dofs={V.n_dofs}, dt={DT}, {STEPS} steps")
    print(f"{'step':>5} {'||u||_L2^2':>14} {'newton iters':>13}")
    uh, _ = V.interpolate(V, u)
    print(f"{0:>5} {energy(uh):>14.8f} {'-':>13}")
    for step in range(1, STEPS + 1):
        u, (iters, res, conv) = solve(u, uh)
        assert bool(conv), f"Newton failed at step {step}: residual {res}"
        uh, _ = V.interpolate(V, u)
        if step % max(1, STEPS // 10) == 0:
            print(f"{step:>5} {energy(uh):>14.8f} {int(iters):>13}")


if __name__ == "__main__":
    main()
