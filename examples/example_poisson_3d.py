"""3D Poisson on the unit cube with P1/P2 tetrahedra (beyond the reference).

The reference library is 2D-only; the tetrahedral tier reuses the same
assembly/solve pipeline one dimension up. Manufactured solution

    u = sin(pi x) sin(pi y) sin(pi z),   u = 0 on the cube boundary,

solved with matrix-free PCG (hybrid BSR + two-level preconditioner) under
uniform refinement; prints the L2/H1 error ladder and observed rates
(expected O(h^2)/O(h) for P1, O(h^3)/O(h^2) for P2).

Env knobs: FEM_LEVELS (default 3), FEM_ORDER (1 or 2), FEM_N0 (coarsest n).
"""

import math
import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

LEVELS = int(os.environ.get("FEM_LEVELS", 3))
ORDER = int(os.environ.get("FEM_ORDER", 1))
N0 = int(os.environ.get("FEM_N0", 3))
PI = math.pi


def u_exact(p):
    return (
        jnp.sin(PI * p[..., 0:1])
        * jnp.sin(PI * p[..., 1:2])
        * jnp.sin(PI * p[..., 2:3])
    )


def grad_exact(p):
    s, c = jnp.sin, jnp.cos
    x, y, z = p[..., 0:1], p[..., 1:2], p[..., 2:3]
    return jnp.concatenate(
        [
            PI * c(PI * x) * s(PI * y) * s(PI * z),
            PI * s(PI * x) * c(PI * y) * s(PI * z),
            PI * s(PI * x) * s(PI * y) * c(PI * z),
        ],
        axis=-1,
    )


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def load_form(basis):
    return 3 * PI**2 * u_exact(basis.integration_points) * basis.v


def main():
    print(f"3D Poisson, P{ORDER} tetrahedra")
    prev = None
    for level in range(LEVELS):
        n = N0 * 2**level
        mesh = MeshTet(unit_cube(n))
        V = fem.Basis(mesh, ElementTet(ORDER, integration_order=2 * ORDER + 1))
        local = V.integrate_bilinear_form_local(stiffness_form)
        b = V.integrate_linear_form(load_form)
        u, info = V.solve_iterative(
            local, b, tol=1e-10, return_info=True
        )
        uh, ugh = V.interpolate(V, u)
        pts = V.integration_points
        e2 = (uh - u_exact(pts)) ** 2
        g2 = ((ugh - grad_exact(pts)) ** 2).sum(-1, keepdims=True)
        l2 = float(jnp.sqrt(jnp.sum(V.integrate_functional(lambda b_: e2))))
        h1 = float(
            jnp.sqrt(jnp.sum(V.integrate_functional(lambda b_: e2 + g2)))
        )
        n_dofs = int(V._coords4global_dofs.shape[-2])
        rates = ""
        if prev is not None:
            rates = (
                f"  rates L2 {math.log2(prev[0] / l2):.2f}"
                f" H1 {math.log2(prev[1] / h1):.2f}"
            )
        print(
            f"n={n:3d}  dofs={n_dofs:7d}  iters={int(info.iterations):4d}"
            f"  L2 error {l2:.4e}  H1 error {h1:.4e}{rates}"
        )
        prev = (l2, h1)


if __name__ == "__main__":
    main()
