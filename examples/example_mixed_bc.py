"""Mixed Dirichlet/Neumann/Robin boundary conditions (beyond the reference).

The reference supports only strong Dirichlet data (the NN boundary
modifier / reduce+solve). With ``BoundaryEdgesBasis`` the natural boundary
terms assemble through the standard form API:

    a(u, v) += alpha * sum_RobinEdges  u v ds      (edge bilinear form)
    l(v)    += sum_NeumannEdges  g v ds            (edge linear form)

Problem here: -lap(u) = f on the unit square with the manufactured
solution u = cos(pi x) cosh(y):
  * Dirichlet on x = 0 (lifted, non-homogeneous),
  * Neumann elsewhere — du/dn = cos(pi x) sinh(1) on the top edge, 0 on
    the bottom (sinh 0 = 0) and on x = 1 (sin pi = 0).

Prints the H1 error under refinement (O(h) for P1).
"""

import math
import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem

LEVELS = int(os.environ.get("FEM_LEVELS", 4))


def exact(pts):
    x, y = pts[..., 0:1], pts[..., 1:2]
    return jnp.cos(math.pi * x) * jnp.cosh(y)


def exact_dx(pts):
    x, y = pts[..., 0:1], pts[..., 1:2]
    return -math.pi * jnp.sin(math.pi * x) * jnp.cosh(y)


def exact_dy(pts):
    x, y = pts[..., 0:1], pts[..., 1:2]
    return jnp.cos(math.pi * x) * jnp.sinh(y)


def rhs(pts):
    # -lap(u) = (pi^2 - 1) u
    return (math.pi**2 - 1.0) * exact(pts)


def neumann(pts):
    """du/dn on the non-Dirichlet boundary (outward normals of the square)."""
    x, y = pts[..., 0:1], pts[..., 1:2]
    g = jnp.zeros_like(x)
    g = jnp.where(y > 1 - 1e-9, exact_dy(pts), g)  # top: n = (0, 1)
    g = jnp.where(y < 1e-9, -exact_dy(pts), g)  # bottom: n = (0, -1)
    g = jnp.where(x > 1 - 1e-9, exact_dx(pts), g)  # right: n = (1, 0)
    return g


def solve(n):
    tri = fem.unit_square(n=n)
    v = np.asarray(tri["vertices"])
    markers = (np.abs(v[:, 0]) < 1e-12).astype(np.int64).reshape(-1, 1)
    mesh = fem.MeshTri(dict(tri, vertex_markers=markers))
    V = fem.Basis(mesh, fem.ElementTri(1, 4))
    Vb = fem.BoundaryEdgesBasis(mesh, fem.ElementLine(1, 4))

    A = V.integrate_bilinear_form(
        lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
    )
    b = V.integrate_linear_form(
        lambda b_: rhs(b_.integration_points) * b_.v
    ) + Vb.integrate_linear_form(
        lambda b_: neumann(b_.integration_points) * b_.v
    )
    u_bc, rhs_l = V.dirichlet_lift(A, b, exact(V._coords4global_dofs))
    u = V.solve(A, u_bc, rhs_l)

    uh, ug = V.interpolate(V, u)

    def h1(b_):
        return (
            (uh - exact(b_.integration_points)) ** 2
            + (ug[..., 0:1] - exact_dx(b_.integration_points)) ** 2
            + (ug[..., 1:2] - exact_dy(b_.integration_points)) ** 2
        )

    return V.n_dofs, float(jnp.sqrt(V.integrate_functional(h1).sum()))


def main():
    print("mixed Dirichlet/Neumann Poisson, u = cos(pi x) cosh(y)")
    print(f"{'dofs':>8} {'H1 error':>12}")
    hist = []
    for level in range(LEVELS):
        n, err = solve(8 * 2**level)
        hist.append((n, err))
        print(f"{n:>8} {err:>12.4e}")
    slope = np.polyfit(
        np.log([h[0] for h in hist]), np.log([h[1] for h in hist]), 1
    )[0]
    print(f"H1 ~ dofs^{slope:.3f} (P1 theory: -0.5)")


if __name__ == "__main__":
    main()
