"""3D adaptive FEM on the Fichera corner (beyond the reference).

The reference is 2D-only and never refines locally; this example runs the
3D counterpart of ``example_adaptive``: solve -lap(u) = 1 with u = 0 on
the boundary of the Fichera domain (-1,1)^3 \\ [0,1]^3, estimate per-tet
errors with the residual + face-jump indicator

    eta_T^2 = h_T^2 ||f||_T^2 + 1/2 sum_F h_F ||[du_h/dn]||_F^2

(P1: the elementwise Laplacian vanishes), Doerfler-mark, and bisect with
the conforming longest-edge (Rivara) tet refinement. The re-entrant edge
caps uniform convergence at eta ~ dofs^(-2/9); the adaptive loop recovers
a rate near the optimal dofs^(-1/3) by grading into the corner.

Env knobs: FEM_STEPS (default 8), FEM_THETA (Doerfler fraction, 0.4).
"""

import os

import common  # noqa: F401  (configures CPU/x64 example defaults)
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.element import ElementTet
from pytorch_fem_solver_tpu.mesh import (
    MeshTet,
    dorfler_mark,
    fichera_corner,
    refine_adaptive_tet,
)
from pytorch_fem_solver_tpu.mesh.generation import refine_uniform_tet

STEPS = int(os.environ.get("FEM_STEPS", 8))
THETA = float(os.environ.get("FEM_THETA", 0.4))


def a_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def l_form(basis):
    return basis.v


def solve_and_estimate(tri):
    """One P1 solve; returns (n_dofs, energy norm of u_h, eta_T)."""
    mesh = MeshTet(tri)
    V = fem.Basis(mesh, ElementTet(1, 2))
    Vf = fem.InteriorFacesBasis(mesh, fem.ElementTriSurface(1, 2))

    local = V.integrate_bilinear_form_local(a_form)
    b = V.integrate_linear_form(l_form)
    u = V.solve_iterative(
        local, b, tol=1e-10, precondition="two_level", symmetric_form=True
    )

    # energy functional: since -lap(u)=1, |u|_a^2 = (f, u) = sum(b * u)
    energy = float(jnp.vdot(b.reshape(-1), u.reshape(-1)))

    h_T = mesh["cells", "length"]
    bulk = np.asarray(
        V.integrate_functional(lambda basis: h_T**2 * jnp.ones(1))
    ).reshape(-1)

    _, ug_faces = V.interpolate(Vf, u)
    n_F = mesh["interior_faces", "normals"][..., None, :, :]
    h_F = jnp.sqrt(mesh["interior_faces", "area"])[..., None, :, :]

    def face_term(basis):
        jump = (ug_faces[:, 0] * n_F).sum(-1, keepdims=True) - (
            ug_faces[:, 1] * n_F
        ).sum(-1, keepdims=True)
        return h_F * jump**2

    per_face = np.asarray(Vf.integrate_functional(face_term)).reshape(-1)
    eta2 = bulk.copy()
    cells = np.asarray(mesh["interior_faces", "cells"])  # (Fi, 2)
    np.add.at(eta2, cells[:, 0], 0.5 * per_face)
    np.add.at(eta2, cells[:, 1], 0.5 * per_face)
    return V.n_dofs, energy, np.sqrt(eta2)


def main():
    tri = fichera_corner(2)
    print(f"Fichera corner, adaptive tet bisection, theta={THETA}")
    print(f"{'step':>4} {'dofs':>8} {'energy':>14} {'eta':>12}")
    adaptive = []
    for step in range(STEPS):
        n, energy, eta = solve_and_estimate(tri)
        adaptive.append((n, float(np.linalg.norm(eta))))
        print(
            f"{step:>4} {n:>8} {energy:>14.8f} "
            f"{np.linalg.norm(eta):>12.4e}"
        )
        tri = refine_adaptive_tet(tri, dorfler_mark(eta, theta=THETA))

    print("uniform refinement of the same initial mesh:")
    tri_u = fichera_corner(2)
    uniform = []
    while True:
        n, energy, eta = solve_and_estimate(tri_u)
        uniform.append((n, float(np.linalg.norm(eta))))
        print(f"{'':>4} {n:>8} {energy:>14.8f} {np.linalg.norm(eta):>12.4e}")
        if n >= adaptive[-1][0] or len(uniform) >= 3:
            break
        tri_u = refine_uniform_tet(tri_u)

    for name, hist in (("adaptive", adaptive), ("uniform", uniform)):
        ns = np.log([h[0] for h in hist])
        es = np.log([h[1] for h in hist])
        slope = np.polyfit(ns, es, 1)[0]
        print(f"{name}: eta ~ dofs^{slope:.3f} (optimal P1 in 3D: -1/3)")


if __name__ == "__main__":
    main()
