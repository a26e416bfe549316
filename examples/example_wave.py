"""Explicit-dynamics wave propagation with a lumped mass matrix (beyond
the reference — no transient or second-order-in-time workload exists in
/root/reference/examples/).

    u_tt = c^2 Δu   on the unit square,  u = 0 on the boundary,

standing-wave manufactured solution u(x, y, t) = cos(sqrt(2) pi c t)
sin(pi x) sin(pi y). Discretized with P1 stiffness and the ROW-SUM LUMPED
mass matrix, stepped by leapfrog (central differences):

    u^{n+1} = 2 u^n - u^{n-1} - dt^2 c^2 M_l^{-1} A u^n

Lumping makes the update explicit — a diagonal scale instead of a solve —
so the whole time loop is one `lax.scan` of (SpMV + axpy)s: the TPU-native
shape for explicit dynamics (one compiled program, zero per-step dispatch,
and on real meshes the SpMV rides the same BSR machinery as the PCG hot
loop). dt follows the CFL bound estimated from the generalized Rayleigh
quotient lambda_max(M_l^{-1} A) via a few on-device power iterations.

Prints the final-time L2 error ladder under dt ~ h refinement (leapfrog +
lumped P1 are both second order: expect ~O(h^2)) and the relative drift of
the discrete leapfrog energy

    E^{n+1/2} = 1/2 |v|_{M_l}^2 + 1/2 a(u^{n+1}, u^n),

which the scheme conserves exactly in exact arithmetic (drift ~ roundoff).

Env knobs: FEM_LEVELS (default 3), FEM_CFL (0.5), FEM_TEND (0.5).
"""

import math
import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem

LEVELS = int(os.environ.get("FEM_LEVELS", 3))
CFL = float(os.environ.get("FEM_CFL", 0.5))
T_END = float(os.environ.get("FEM_TEND", 0.5))
C = 1.0
PI = math.pi
OMEGA = math.sqrt(2.0) * PI * C


def exact(x, y, t):
    return jnp.cos(OMEGA * t) * jnp.sin(PI * x) * jnp.sin(PI * y)


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def mass_form(basis):
    return basis.v @ jnp.matrix_transpose(basis.v)


def main():
    print("leapfrog wave equation, lumped P1 mass")
    prev = None
    for level in range(LEVELS):
        n = 8 * 2**level
        mesh = fem.MeshTri(fem.unit_square(n=n))
        V = fem.Basis(mesh, fem.ElementTri(1, 4))
        A = V.reduce(V.integrate_bilinear_form(stiffness_form))
        # row-sum lumping on the FULL mass matrix, then restrict to inner
        # DOFs: lumping the reduced M instead drops the boundary-column
        # mass of boundary-adjacent rows and degrades the L2 rate to ~1.8
        m_l = V.integrate_bilinear_form(mass_form).sum(axis=1, keepdims=True)[
            V._basis_parameters["inner_dofs"]
        ]
        inv_m = 1.0 / m_l

        # CFL: dt <= 2 / (c sqrt(lambda_max(M_l^-1 A))), power-iterated
        v = jnp.ones_like(m_l)

        def power(v, _):
            w = inv_m * (A @ v)
            return w / jnp.linalg.norm(w), None

        v, _ = jax.lax.scan(power, v, None, length=30)
        lam_max = float((v * (inv_m * (A @ v))).sum() / (v * v).sum())
        dt = CFL * 2.0 / (C * math.sqrt(lam_max))
        n_steps = int(math.ceil(T_END / dt))
        dt = T_END / n_steps

        coords = V._coords4global_dofs
        u0 = V.reduce(exact(coords[..., 0:1], coords[..., 1:2], 0.0))
        # u_t(0) = 0: second-order Taylor start
        a0 = -(C**2) * inv_m * (A @ u0)
        u1 = u0 + 0.5 * dt**2 * a0

        def step(carry, _):
            u_prev, u = carry
            u_next = 2 * u - u_prev - dt**2 * C**2 * inv_m * (A @ u)
            return (u, u_next), None

        def energy(u_prev, u):
            v = (u - u_prev) / dt
            return 0.5 * float(
                (v * m_l * v).sum() + C**2 * (u_prev * (A @ u)).sum()
            )

        (u_prev, uT), _ = jax.lax.scan(
            step, (u0, u1), None, length=n_steps - 1
        )  # ONE compiled time loop
        e0, eT = energy(u0, u1), energy(u_prev, uT)

        u_full = V.solution_tensor().at[
            V._basis_parameters["inner_dofs"], :
        ].set(uT)
        uh, _ = V.interpolate(V, u_full)
        pts = V.integration_points
        err2 = (uh - exact(pts[..., 0:1], pts[..., 1:2], T_END)) ** 2
        l2 = float(jnp.sqrt(V.integrate_functional(lambda b: err2).sum()))
        rate = "" if prev is None else f"  rate {math.log2(prev / l2):.2f}"
        drift = abs(eT - e0) / abs(e0)
        print(
            f"n={n:4d} dt={dt:.5f} steps={n_steps:5d}  "
            f"L2(T) error {l2:.4e}{rate}  energy drift {drift:.2e}"
        )
        prev = l2


if __name__ == "__main__":
    main()
