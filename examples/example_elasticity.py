"""2D linear elasticity with a vector-valued P1 basis (beyond the reference).

The reference framework is scalar-only; ``VectorBasis`` lifts the same
mesh/element/assembly machinery to coupled displacement components. Plane
strain on the unit square, manufactured solution

    u = ( sin(pi x) sin(pi y),  x (1-x) y (1-y) ),   u = 0 on the boundary,

with the Lame form  a(u, v) = ∫ 2 mu  eps(u):eps(v) + lam (div u)(div v).

Solved two ways and compared:
  * Jacobi-PCG (matrix-free hybrid BSR),
  * PCG with the rigid-body-mode coarse space — the vector-basis default
    under ``precondition="two_level"``: constants-per-aggregate coarse
    spaces force equal corrections on both components and degrade like
    1/h on elasticity, while the RBM space (translations + rotation per
    aggregate) keeps the iteration count essentially h-independent.

Prints the L2/H1 errors under refinement (O(h^2)/O(h) for P1) and the
PCG iteration counts.
"""

import math
import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem

LEVELS = int(os.environ.get("FEM_LEVELS", 4))
MU = float(os.environ.get("FEM_MU", 1.0))
LAM = float(os.environ.get("FEM_LAM", 2.0))
PI = math.pi


def u_exact(x, y):
    return jnp.stack(
        [jnp.sin(PI * x) * jnp.sin(PI * y), x * (1 - x) * y * (1 - y)],
        axis=-1,
    )


def grad_exact(x, y):
    s, c = jnp.sin, jnp.cos
    return jnp.stack(
        [
            jnp.stack(
                [PI * c(PI * x) * s(PI * y), PI * s(PI * x) * c(PI * y)],
                axis=-1,
            ),
            jnp.stack(
                [(1 - 2 * x) * y * (1 - y), x * (1 - x) * (1 - 2 * y)],
                axis=-1,
            ),
        ],
        axis=-2,
    )


def body_force(x, y):
    # f = -div sigma(u) = -(mu lap u + (mu + lam) grad div u)
    s, c = jnp.sin, jnp.cos
    f1 = MU * 2 * PI**2 * s(PI * x) * s(PI * y) + (MU + LAM) * (
        PI**2 * s(PI * x) * s(PI * y) - (1 - 2 * x) * (1 - 2 * y)
    )
    f2 = MU * (2 * y * (1 - y) + 2 * x * (1 - x)) - (MU + LAM) * (
        PI**2 * c(PI * x) * c(PI * y) - 2 * x * (1 - x)
    )
    return jnp.stack([f1, f2], axis=-1)


def elasticity(b):
    g = b.v_grad  # (T, q|1, n_vloc, nc, d)
    eps = 0.5 * (g + jnp.swapaxes(g, -1, -2))
    div = jnp.trace(g, axis1=-2, axis2=-1)
    return (
        2 * MU * jnp.einsum("...icd,...jcd->...ij", eps, eps)
        + LAM * div[..., :, None] * div[..., None, :]
    )


def load(b):
    x = b.integration_points[..., 0]
    y = b.integration_points[..., 1]
    return (b.v * body_force(x, y)).sum(-1, keepdims=True)


def errors(V, u):
    uh, ugh = V.interpolate(V, u)
    x = V.integration_points[..., 0]
    y = V.integration_points[..., 1]
    ue = u_exact(x, y)
    ge = grad_exact(x, y)

    def l2(b):
        return ((uh - ue) ** 2).sum(-1, keepdims=True)

    def h1semi(b):
        return ((ugh - ge) ** 2).sum((-1, -2))[..., None]

    e_l2 = float(jnp.sqrt(V.integrate_functional(l2).sum()))
    e_h1 = float(jnp.sqrt(V.integrate_functional(h1semi).sum()))
    return e_l2, e_h1


def main():
    print(f"plane strain, mu={MU} lam={LAM}")
    prev = None
    for level in range(LEVELS):
        n = 8 * 2**level
        mesh = fem.MeshTri(fem.unit_square(n=n))
        V = fem.VectorBasis(mesh, fem.ElementTri(1, 4))
        local = V.integrate_bilinear_form_local(elasticity)
        b = V.integrate_linear_form(load)

        u, info = V.solve_iterative(
            local,
            b,
            tol=1e-11,
            precondition="two_level",  # -> RBM coarse for vector bases
            symmetric_form=True,
            return_info=True,
        )
        u_j, info_j = V.solve_iterative(
            local, b, tol=1e-11, precondition="jacobi", return_info=True
        )
        e_l2, e_h1 = errors(V, u)
        rate = "" if prev is None else f"  L2 ratio {prev / e_l2:.2f}"
        prev = e_l2
        print(
            f"n={n:4d} dofs={V.n_dofs:7d}  L2={e_l2:.3e} H1={e_h1:.3e}"
            f"  rbm_iters={int(info.iterations):4d}"
            f"  jacobi_iters={int(info_j.iterations):4d}{rate}"
        )
        assert float(jnp.abs(u - u_j).max()) < 1e-7

    if os.environ.get("FEM_SHOW_PLOTS", "0") == "1":
        import matplotlib.pyplot as plt

        verts = np.asarray(mesh["vertices", "coordinates"])
        cells = np.asarray(mesh["cells", "vertices"])
        disp = np.asarray(u).reshape(-1, 2)
        mag = np.linalg.norm(disp, axis=1)
        fig, ax = plt.subplots(figsize=(6, 5))
        t = ax.tripcolor(verts[:, 0], verts[:, 1], cells, mag, shading="gouraud")
        scale = 0.1 / max(mag.max(), 1e-12)
        ax.quiver(verts[:, 0], verts[:, 1], disp[:, 0], disp[:, 1], scale_units="xy", scale=1 / scale)
        fig.colorbar(t, label="|u|")
        ax.set_title("displacement magnitude + field")
        plt.show()


if __name__ == "__main__":
    main()
