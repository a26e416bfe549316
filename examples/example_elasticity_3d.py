"""3D linear elasticity on the unit cube (beyond the reference).

Lame problem with a manufactured bubble displacement field

    u = w(x, y, z) (1, 2, -1),   w = x(1-x) y(1-y) z(1-z),   u = 0 on the
    boundary; the body force f = -div sigma(u) is derived by forward-mode
    autodiff of the stress — no hand-computed right-hand side to get wrong.

Discretized with the vector-valued P1 tetrahedral basis; solved with
matrix-free PCG under the rigid-body-mode coarse space (6 modes in 3D:
3 translations + 3 rotations — `VectorBasis` + `precondition="two_level"`
select it automatically). Prints the L2 error ladder and PCG iteration
counts under refinement.

Env knobs: FEM_LEVELS (default 3), FEM_MU / FEM_LAM, FEM_N0.
"""

import math
import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

LEVELS = int(os.environ.get("FEM_LEVELS", 3))
MU = float(os.environ.get("FEM_MU", 1.0))
LAM = float(os.environ.get("FEM_LAM", 2.0))
N0 = int(os.environ.get("FEM_N0", 3))


def u_exact(p):
    w = (
        p[..., 0] * (1 - p[..., 0])
        * p[..., 1] * (1 - p[..., 1])
        * p[..., 2] * (1 - p[..., 2])
    )
    return jnp.stack([w, 2 * w, -w], axis=-1)


def body_force(p):
    def u_fn(x):
        w = x[0] * (1 - x[0]) * x[1] * (1 - x[1]) * x[2] * (1 - x[2])
        return jnp.stack([w, 2 * w, -w])

    def sigma(x):
        G = jax.jacfwd(u_fn)(x)
        eps = 0.5 * (G + G.T)
        return 2 * MU * eps + LAM * jnp.trace(eps) * jnp.eye(3)

    def divsig(x):
        return jnp.einsum("ijj->i", jax.jacfwd(sigma)(x))

    flat = p.reshape(-1, 3)
    return -jax.vmap(divsig)(flat).reshape(p.shape)


def elasticity(b):
    g = b.v_grad
    eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
    div = jnp.trace(g, axis1=-2, axis2=-1)
    return (
        2 * MU * jnp.einsum("...icd,...jcd->...ij", eps, eps)
        + LAM * div[..., :, None] * div[..., None, :]
    )


def load(b):
    p = b.integration_points[..., 0, :]
    return (b.v * body_force(p)[..., None, :]).sum(-1, keepdims=True)


def main():
    print(f"3D linear elasticity, mu={MU} lam={LAM} (RBM coarse space)")
    prev = None
    for level in range(LEVELS):
        n = N0 * 2**level
        mesh = MeshTet(unit_cube(n))
        V = fem.VectorBasis(mesh, ElementTet(1, 2))
        local = V.integrate_bilinear_form_local(elasticity)
        b = V.integrate_linear_form(load)
        u, info = V.solve_iterative(
            local, b, tol=1e-10, precondition="two_level", return_info=True
        )
        uh, _ = V.interpolate(V, u)
        err2 = (
            (uh[..., 0, :] - u_exact(V.integration_points[..., 0, :])) ** 2
        ).sum(-1)
        l2 = float(
            jnp.sqrt(
                jnp.sum(
                    V.integrate_functional(
                        lambda b_: err2[..., None, None]
                    )
                )
            )
        )
        rate = "" if prev is None else f"  rate {math.log2(prev / l2):.2f}"
        print(
            f"n={n:3d}  dofs={V.n_dofs:7d}  iters={int(info.iterations):4d}"
            f"  L2 error {l2:.4e}{rate}"
        )
        prev = l2


if __name__ == "__main__":
    main()
