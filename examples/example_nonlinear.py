"""Nonlinear Poisson via Newton with autodiff Jacobians (beyond the reference).

Solves -div((1 + u^2) grad u) = f on the unit square with a manufactured
solution u* = sin(pi x) sin(pi y). The weak residual is a plain JAX
closure; ``Basis.solve_newton`` differentiates it per cell with ``jax.jvp``
to get the exact consistent Jacobian (no hand-derived linearization), and
solves each non-symmetric Newton system with matrix-free BiCGStab on the
hybrid BSR operator. The reference has no nonlinear solver at all (dense
LU only, torch_fem/basis/abstract_basis.py:177-195).

Prints the Newton residual history (quadratic tail) at each mesh level and
the H1-error convergence rate (P1: O(h)).

Env knobs: FEM_LEVELS (default 4, mesh halvings from max_area 0.5^5).
"""

import math
import os

import common  # noqa: F401  (configures CPU/x64 example defaults)
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem

LEVELS = int(os.environ.get("FEM_LEVELS", 4))
PI = math.pi


def exact(p):
    x, y = p[..., 0:1], p[..., 1:2]
    return jnp.sin(PI * x) * jnp.sin(PI * y)


def rhs(p):
    x, y = p[..., 0:1], p[..., 1:2]
    u = jnp.sin(PI * x) * jnp.sin(PI * y)
    ux = PI * jnp.cos(PI * x) * jnp.sin(PI * y)
    uy = PI * jnp.sin(PI * x) * jnp.cos(PI * y)
    lap = -2 * PI**2 * u
    # f = -div((1+u^2) grad u) = -(2 u |grad u|^2 + (1+u^2) lap u)
    return -(2 * u * (ux**2 + uy**2) + (1 + u**2) * lap)


def residual(b, u, ug):
    kappa = 1.0 + u**2
    return (
        kappa * (b.v_grad * ug).sum(-1, keepdims=True)
        - rhs(b.integration_points) * b.v
    )


def h1_error(V, u):
    uh, ug = V.interpolate(V, u)

    def sq(b):
        x = b.integration_points[..., 0:1]
        y = b.integration_points[..., 1:2]
        gx = PI * jnp.cos(PI * x) * jnp.sin(PI * y)
        gy = PI * jnp.sin(PI * x) * jnp.cos(PI * y)
        return (
            (uh - exact(b.integration_points)) ** 2
            + (ug[..., 0:1] - gx) ** 2
            + (ug[..., 1:2] - gy) ** 2
        )

    return float(jnp.sqrt(V.integrate_functional(sq).sum()))


def main():
    print("nonlinear Poisson, kappa(u) = 1 + u^2, Newton + BiCGStab")
    hist = []
    for level in range(LEVELS):
        mesh = fem.MeshTri(fem.unit_square(max_area=0.5 ** (5 + 2 * level)))
        V = fem.Basis(mesh, fem.ElementTri(1, 3))
        u, info = V.solve_newton(residual, tol=1e-12, return_info=True)
        err = h1_error(V, u)
        hist.append((V.n_dofs, err))
        norms = " -> ".join(f"{n:.1e}" for n in info["residual_norms"])
        print(
            f"dofs={V.n_dofs:>7} newton_iters={info['iterations']} "
            f"H1 error={err:.4e}\n  residuals: {norms}"
        )
    if len(hist) > 1:
        import numpy as np

        ns = np.log([h[0] for h in hist])
        es = np.log([h[1] for h in hist])
        print(f"H1 ~ dofs^{np.polyfit(ns, es, 1)[0]:.3f} (optimal P1: -0.5)")


if __name__ == "__main__":
    main()
