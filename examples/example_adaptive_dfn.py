"""Adaptive refinement on a fracture network (beyond the reference).

Estimator-driven local refinement of the two-fracture DFN from
example_fractures_fem, kept conforming across the trace by the
cross-fracture closure in ``mesh.refinement``: marking cells in one
fracture drags the shared trace edges of the other along, and the glued
global DOFs re-identify the new midpoints.

The indicator is the classical residual estimator per element —
h_T^2 ||f||^2 plus the per-fracture interior-edge flux jumps
h_E ||[du_h/dn]||^2. The exact solution of the network problem has
reduced regularity across the trace (a flux kink balancing mass between
fractures), so the estimator concentrates refinement there — exactly the
behavior local refinement exists for.

Env knobs: FEM_H (initial mesh size, default 0.2), FEM_STEPS (default 8),
FEM_THETA (Doerfler fraction, default 0.5).
"""

import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh.dfn import build_fracture_network
from pytorch_fem_solver_tpu.mesh.refinement import dorfler_mark

H = float(os.environ.get("FEM_H", 0.2))
STEPS = int(os.environ.get("FEM_STEPS", 8))
THETA = float(os.environ.get("FEM_THETA", 0.5))

F1 = [[-1, 0, 0], [1, 0, 0], [1, 1, 0], [-1, 1, 0]]
F2 = [[0, 0, -1], [0, 0, 1], [0, 1, 1], [0, 1, -1]]


def a_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def l_form(basis):
    return basis.v  # f = 1


def solve_and_estimate(mesh):
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    V_edges = fem.InteriorEdgesNetworkBasis(mesh, fem.ElementLine(1, 2))

    local = V.integrate_bilinear_form_local(a_form)
    b = V.integrate_linear_form(l_form)
    u = V.solve_iterative(
        local, b, tol=1e-10, precondition="two_level", symmetric_form=True
    )

    h_T = mesh["cells", "length"]
    bulk = np.asarray(
        V.integrate_functional(lambda basis: h_T**2 * 1.0**2 * basis.v**0)
    ).reshape(-1)

    _, ug_edges = V.interpolate(V_edges, u)
    n_E = mesh["interior_edges", "normals_3d"][..., None, :, :]
    ec = np.asarray(mesh["interior_edges", "coordinates_3d"])
    h_E = jnp.asarray(
        np.linalg.norm(ec[:, 1] - ec[:, 0], axis=-1)
    )[:, None, None, None]

    def edge_term(basis):
        jump = (ug_edges[:, 0] * n_E).sum(-1, keepdims=True) + (
            ug_edges[:, 1] * -n_E
        ).sum(-1, keepdims=True)
        return h_E * jump**2

    per_edge = np.asarray(V_edges.integrate_functional(edge_term)).reshape(-1)
    eta2 = bulk.copy()
    cells = np.asarray(mesh["interior_edges", "cells"])
    np.add.at(eta2, cells[:, 0], 0.5 * per_edge)
    np.add.at(eta2, cells[:, 1], 0.5 * per_edge)
    energy = float((np.asarray(u)[:, 0] * np.asarray(b)[:, 0]).sum())
    return V.n_dofs, energy, np.sqrt(eta2)


def near_trace_fraction(mesh, radius=0.15):
    coords = np.asarray(mesh["global", "vertices_3d"])
    d = np.sqrt(coords[:, 0] ** 2 + coords[:, 2] ** 2)
    return float((d < radius).mean())


def main():
    mesh = build_fracture_network([F1, F2], h=H)
    frac0 = near_trace_fraction(mesh)
    print(f"adaptive DFN refinement, h0={H}, theta={THETA}")
    print(f"{'step':>4} {'cells':>8} {'dofs':>8} {'energy':>14} {'eta':>12}")
    for step in range(STEPS):
        n, energy, eta = solve_and_estimate(mesh)
        print(
            f"{step:>4} {mesh.n_cells:>8} {n:>8} {energy:>14.8f} "
            f"{np.linalg.norm(eta):>12.4e}"
        )
        if step == STEPS - 1:
            break
        mesh = mesh.refined(dorfler_mark(eta, theta=THETA))

    # where did the DOFs go? share of vertices near the trace, before/after
    print(
        f"global DOFs within 0.15 of the trace: {frac0:.1%} initially -> "
        f"{near_trace_fraction(mesh):.1%} after refinement"
    )


if __name__ == "__main__":
    main()
