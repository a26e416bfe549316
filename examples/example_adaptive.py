"""Adaptive FEM: estimator-driven local refinement (beyond the reference).

The reference computes a-posteriori indicators (bulk residual + interior-
edge normal-gradient jumps, /root/reference/examples/example_jump.py:75-94)
but only ever refines globally by re-triangulating at a smaller area
(example_weak_convergence.py:95-144). This example closes the loop the
estimator exists for:

    solve -> per-element eta_T -> Doerfler marking -> longest-edge
    bisection (mesh.refinement) -> repeat

on the exponential boundary-layer problem (example_exponetial's
manufactured solution, steepness C): eta_T^2 = h_T^2 ||f||_T^2
+ 1/2 sum_E h_E ||[du_h/dn]||_E^2 (P1: the elementwise Laplacian
vanishes). Prints H1 error vs DOFs for the adaptive loop next to uniform
refinement of the same initial mesh.

Env knobs: FEM_C (layer steepness, default 8), FEM_STEPS (default 10),
FEM_THETA (Doerfler fraction, default 0.5).
"""

import os

import common
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.mesh.refinement import dorfler_mark, refine_adaptive

C = float(os.environ.get("FEM_C", 8.0))
STEPS = int(os.environ.get("FEM_STEPS", 10))
THETA = float(os.environ.get("FEM_THETA", 0.5))


def exact(pts):
    x, y = common.split_xy(pts)
    return x * y * (1 - x) * (1 - y) * (jnp.exp(C * x) - 1)


def exact_dx(pts):
    x, y = common.split_xy(pts)
    return y * (1 - y) * (
        (1 - 2 * x) * (jnp.exp(C * x) - 1) + x * (1 - x) * C * jnp.exp(C * x)
    )


def exact_dy(pts):
    x, y = common.split_xy(pts)
    return x * (1 - x) * (1 - 2 * y) * (jnp.exp(C * x) - 1)


def rhs(pts):
    x, y = common.split_xy(pts)
    e = jnp.exp(C * x)
    u_xx = y * (1 - y) * (
        -2 * (e - 1) + 2 * (1 - 2 * x) * C * e + x * (1 - x) * C**2 * e
    )
    u_yy = -2 * x * (1 - x) * (e - 1)
    return -(u_xx + u_yy)


def a_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def l_form(basis):
    return rhs(basis.integration_points) * basis.v


def h1_error(V, u):
    uh, ug = V.interpolate(V, u)

    def sq(basis):
        return (
            (uh - exact(basis.integration_points)) ** 2
            + (ug[..., 0:1] - exact_dx(basis.integration_points)) ** 2
            + (ug[..., 1:2] - exact_dy(basis.integration_points)) ** 2
        )

    return float(jnp.sqrt(V.integrate_functional(sq).sum()))


def solve_and_estimate(tri):
    """One solve on the triangulation; returns (n_dofs, H1 error, eta_T)."""
    mesh = fem.MeshTri(tri)
    V = fem.Basis(mesh, fem.ElementTri(1, 2))
    V_edges = fem.InteriorEdgesBasis(mesh, fem.ElementLine(1, 2))

    local = V.integrate_bilinear_form_local(a_form)
    b = V.integrate_linear_form(l_form)
    u = V.solve_iterative(
        local, b, tol=1e-10, precondition="two_level", symmetric_form=True
    )

    # bulk term: h_T^2 ||f||_T^2 (P1 => elementwise Laplacian is zero)
    h_T = mesh["cells", "length"]
    bulk = np.asarray(
        V.integrate_functional(
            lambda basis: h_T**2 * rhs(basis.integration_points) ** 2
        )
    ).reshape(-1)

    # edge term: h_E [du_h/dn]^2, two-sided traces of the P1 gradient
    _, ug_edges = V.interpolate(V_edges, u)
    n_E = mesh["interior_edges", "normals"][..., None, :, :]
    h_E = mesh["interior_edges", "length"][..., None, :, :]

    def edge_term(basis):
        jump = (ug_edges[:, 0] * n_E).sum(-1, keepdims=True) + (
            ug_edges[:, 1] * -n_E
        ).sum(-1, keepdims=True)
        return h_E * jump**2

    per_edge = np.asarray(V_edges.integrate_functional(edge_term)).reshape(-1)
    eta2 = bulk.copy()
    cells = np.asarray(mesh["interior_edges", "cells"])  # (Ei, 2)
    np.add.at(eta2, cells[:, 0], 0.5 * per_edge)
    np.add.at(eta2, cells[:, 1], 0.5 * per_edge)
    return V.n_dofs, h1_error(V, u), np.sqrt(eta2)


def main():
    tri = fem.unit_square(n=8)
    print(f"adaptive refinement, boundary-layer C={C}, theta={THETA}")
    print(f"{'step':>4} {'dofs':>8} {'H1 error':>12} {'eta':>12}")
    adaptive = []
    for step in range(STEPS):
        n, err, eta = solve_and_estimate(tri)
        adaptive.append((n, err))
        print(f"{step:>4} {n:>8} {err:>12.4e} {np.linalg.norm(eta):>12.4e}")
        tri = refine_adaptive(tri, dorfler_mark(eta, theta=THETA))

    print("uniform refinement of the same initial mesh:")
    tri_u = fem.unit_square(n=8)
    uniform = []
    while True:
        n, err, _ = solve_and_estimate(tri_u)
        uniform.append((n, err))
        print(f"{'':>4} {n:>8} {err:>12.4e}")
        if n >= adaptive[-1][0]:
            break
        from pytorch_fem_solver_tpu.mesh.generation import refine_uniform

        tri_u = refine_uniform(tri_u)

    for name, hist in (("adaptive", adaptive), ("uniform", uniform)):
        ns = np.log([h[0] for h in hist])
        es = np.log([h[1] for h in hist])
        slope = np.polyfit(ns, es, 1)[0]
        print(f"{name}: H1 ~ dofs^{slope:.3f} (optimal P1: -0.5)")


if __name__ == "__main__":
    main()
