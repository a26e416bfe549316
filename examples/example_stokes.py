"""Stokes flow with Taylor-Hood (P2-P1) mixed elements (beyond the reference).

    -mu Δu + ∇p = f,   div u = 0   on the unit square,   u = 0 on the boundary,

with the manufactured divergence-free velocity u = curl ψ,
ψ = x²(1-x)² y²(1-y)², and pressure p = x³ + y³ - 1/2 (zero mean); the body
force f = -mu Δu + ∇p is derived by forward-mode autodiff — nothing
hand-computed to get wrong.

Discretization: velocity in the vector-valued P2 basis, pressure in P1 on
the same mesh (the inf-sup-stable Taylor-Hood pair). The pressure-velocity
coupling B[q, u] = -∫ q div u assembles with
``integrate_mixed_bilinear_form`` — the two-space assembly the reference
has no counterpart for. The saddle-point system

    [ A  Bᵀ ] [u]   [f]
    [ B  0  ] [p] = [0]

is solved dense (LU) with one pinned pressure DOF (the constant nullspace),
then the pressure is shifted to zero mean. Prints the velocity/pressure
error ladder (Taylor-Hood theory: O(h³) velocity L2, O(h²) pressure L2).

Env knobs: FEM_LEVELS (default 3), FEM_MU, FEM_N0 (default 4).
"""

import math
import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem

LEVELS = int(os.environ.get("FEM_LEVELS", 3))
MU = float(os.environ.get("FEM_MU", 1.0))
N0 = int(os.environ.get("FEM_N0", 4))


def psi(x):
    return (x[0] * (1 - x[0])) ** 2 * (x[1] * (1 - x[1])) ** 2


def u_fn(x):
    g = jax.grad(psi)(x)
    return jnp.stack([g[1], -g[0]])  # curl: divergence-free by construction


def p_fn(x):
    return x[0] ** 3 + x[1] ** 3 - 0.5


def f_fn(x):
    lap = jnp.trace(jax.jacfwd(jax.jacfwd(u_fn))(x), axis1=-2, axis2=-1)
    return -MU * lap + jax.grad(p_fn)(x)


def vmapped(fn, pts):
    flat = pts.reshape(-1, 2)
    out = jax.vmap(fn)(flat)
    return out.reshape(pts.shape[:-1] + out.shape[1:])


def a_form(b):
    g = b.v_grad
    return MU * jnp.einsum("...icd,...jcd->...ij", g, g)


def div_form(test_p, trial_u):
    div = jnp.trace(trial_u.v_grad, axis1=-2, axis2=-1)  # (T, q, n_vloc)
    q_vals = test_p.v[..., 0]  # (q, n_loc_p)
    return -(q_vals[..., :, None] * div[..., None, :])


def load(b):
    pts = b.integration_points[..., 0, :]
    f = vmapped(f_fn, pts)
    return (b.v * f[..., None, :]).sum(-1, keepdims=True)


def main():
    print("Taylor-Hood (P2-P1) Stokes, mu =", MU)
    prev = None
    for level in range(LEVELS):
        n = N0 * 2**level
        mesh = fem.MeshTri(fem.unit_square(n=n))
        Vu = fem.VectorBasis(mesh, fem.ElementTri(2, 4))
        Vp = fem.Basis(mesh, fem.ElementTri(1, 4))

        A = Vu.reduce(Vu.integrate_bilinear_form(a_form))
        f = Vu.reduce(Vu.integrate_linear_form(load))
        B_full = Vp.integrate_mixed_bilinear_form(Vu, div_form)
        inner_u = Vu._basis_parameters["inner_dofs"]
        B = B_full[:, inner_u]  # pressure rows x interior velocity columns

        n_u, n_p = A.shape[0], B.shape[0]
        K = jnp.zeros((n_u + n_p, n_u + n_p))
        K = K.at[:n_u, :n_u].set(A)
        K = K.at[n_u:, :n_u].set(B)
        K = K.at[:n_u, n_u:].set(B.T)
        # pin the constant pressure nullspace: replace the last pressure row
        # by the identity (value fixed to 0), symmetrically
        pin = n_u + n_p - 1
        K = K.at[pin, :].set(0.0).at[:, pin].set(0.0).at[pin, pin].set(1.0)
        rhs = jnp.concatenate([f, jnp.zeros((n_p, 1))])
        sol = jnp.linalg.solve(K, rhs)

        u = Vu.solution_tensor().at[inner_u, :].set(sol[:n_u])
        p = sol[n_u:, 0]

        uh, _ = Vu.interpolate(Vu, u)
        pts = Vu.integration_points[..., 0, :]
        ue = vmapped(u_fn, pts)
        err_u = float(
            jnp.sqrt(
                jnp.sum(
                    Vu.integrate_functional(
                        lambda b_: ((uh[..., 0, :] - ue) ** 2).sum(-1)[
                            ..., None, None
                        ]
                    )
                )
            )
        )

        ph, _ = Vp.interpolate(Vp, p.reshape(-1, 1))
        pe = vmapped(p_fn, Vp.integration_points[..., 0, :])
        # shift the computed pressure to zero mean before comparing
        area_mean = jnp.sum(
            Vp.integrate_functional(lambda b_: ph[..., 0, 0][..., None, None])
        )
        err_p = float(
            jnp.sqrt(
                jnp.sum(
                    Vp.integrate_functional(
                        lambda b_: ((ph[..., 0, 0] - area_mean - pe) ** 2)[
                            ..., None, None
                        ]
                    )
                )
            )
        )
        rates = ""
        if prev is not None:
            rates = (
                f"  rates u {math.log2(prev[0] / err_u):.2f}"
                f" p {math.log2(prev[1] / err_p):.2f}"
            )
        print(
            f"n={n:3d}  u-dofs={n_u:6d} p-dofs={n_p:5d}"
            f"  |u-uh| {err_u:.4e}  |p-ph| {err_p:.4e}{rates}"
        )
        prev = (err_u, err_p)


if __name__ == "__main__":
    main()
