"""Laplace eigenmodes via matrix-free subspace iteration (beyond the reference).

Computes the smallest Dirichlet Laplace eigenpairs on the unit square and
unit cube with ``Basis.solve_eigsh`` (shift-invert subspace iteration whose
inner solves are the same preconditioned CG as the linear path) and
compares against the closed-form spectrum pi^2 (m^2 + n^2 [+ p^2]). P1
Rayleigh quotients converge from above at O(h^2). The reference has no
eigen capability at all (dense LU solves only).

Env knobs: FEM_K (modes, default 6), FEM_LEVELS (default 2).
"""

import math
import os

import common  # noqa: F401  (configures CPU/x64 example defaults)
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import MeshTet, unit_cube

K = int(os.environ.get("FEM_K", 6))
LEVELS = int(os.environ.get("FEM_LEVELS", 2))
PI2 = math.pi**2


def a_form(b):
    return b.v_grad @ jnp.matrix_transpose(b.v_grad)


def m_form(b):
    return b.v @ jnp.matrix_transpose(b.v)


def square_spectrum(k):
    vals = sorted(
        (m * m + n * n) * PI2 for m in range(1, 8) for n in range(1, 8)
    )
    return np.array(vals[:k])


def main():
    exact = square_spectrum(K)
    print(f"unit square, first {K} Dirichlet Laplace modes")
    print("exact:", np.round(exact, 3))
    for level in range(LEVELS):
        mesh = fem.MeshTri(fem.unit_square(max_area=0.5 ** (7 + 2 * level)))
        V = fem.Basis(mesh, fem.ElementTri(1, 3))
        vals, vecs, info = V.solve_eigsh(
            a_form, m_form, k=K, tol=1e-8, return_info=True
        )
        vals = np.asarray(vals)
        rel = np.abs(vals - exact) / exact
        print(
            f"dofs={V.n_dofs:>6} rounds={info.iterations} "
            f"vals={np.round(vals, 3)} max rel err={rel.max():.2e}"
        )

    mesh3 = MeshTet(unit_cube(5))
    V3 = fem.Basis(mesh3, ElementTet(1, 2))
    vals3, _ = V3.solve_eigsh(a_form, m_form, k=2, tol=1e-7)
    print(
        f"unit cube first mode: {float(vals3[0]):.3f} "
        f"(exact 3 pi^2 = {3 * PI2:.3f}, P1 from above)"
    )


if __name__ == "__main__":
    main()
