"""Transient heat equation with a jitted theta-scheme (beyond the reference).

    u_t = Δu + f   on the unit square,  u = 0 on the boundary,

manufactured solution u(x, y, t) = e^{-t} sin(pi x) sin(pi y), so
f = (2 pi^2 - 1) u. Discretized with P1 mass/stiffness matrices and the
theta-scheme (theta = 1/2: Crank-Nicolson, second order in time):

    (M + theta dt A) u^{n+1} = (M - (1-theta) dt A) u^n + dt f^{n+theta}

The step matrix is factored once (LU) and the whole time loop runs inside a
single `lax.scan` — the TPU-native shape for time stepping: one compiled
program, no per-step dispatch. Prints the final-time L2 error ladder and
the observed convergence rate under simultaneous space-time refinement
(dt ~ h: expect ~O(h^2) for Crank-Nicolson + P1 mass lumping-free).

Env knobs: FEM_LEVELS (default 3), FEM_THETA (0.5), FEM_TSTEPS0 (8).
"""

import math
import os

import common  # noqa: F401  (repo path + CPU/float64 example defaults)
import jax
import jax.numpy as jnp

import pytorch_fem_solver_tpu as fem

LEVELS = int(os.environ.get("FEM_LEVELS", 3))
THETA = float(os.environ.get("FEM_THETA", 0.5))
TSTEPS0 = int(os.environ.get("FEM_TSTEPS0", 8))
T_END = 0.5
PI = math.pi


def exact(x, y, t):
    return jnp.exp(-t) * jnp.sin(PI * x) * jnp.sin(PI * y)


def stiffness_form(basis):
    return basis.v_grad @ jnp.matrix_transpose(basis.v_grad)


def mass_form(basis):
    return basis.v @ jnp.matrix_transpose(basis.v)


def main():
    print(f"theta-scheme heat equation (theta={THETA})")
    prev = None
    for level in range(LEVELS):
        n = 8 * 2**level
        n_steps = TSTEPS0 * 2**level
        dt = T_END / n_steps

        mesh = fem.MeshTri(fem.unit_square(n=n))
        V = fem.Basis(mesh, fem.ElementTri(1, 4))
        A = V.reduce(V.integrate_bilinear_form(stiffness_form))
        M = V.reduce(V.integrate_bilinear_form(mass_form))

        step_matrix = M + THETA * dt * A
        lu, piv = jax.scipy.linalg.lu_factor(step_matrix)
        explicit = M - (1.0 - THETA) * dt * A

        pts = V.integration_points
        x, y = pts[..., 0:1], pts[..., 1:2]

        def load_at(t):
            return V.reduce(
                V.integrate_linear_form(
                    lambda b: (2 * PI**2 - 1.0) * exact(x, y, t) * b.v
                )
            )

        # interior DOFs of the interpolated initial condition
        coords = V._coords4global_dofs
        u0_full = exact(coords[..., 0:1], coords[..., 1:2], 0.0)
        u0 = V.reduce(u0_full)

        def step(u, t):
            rhs = explicit @ u + dt * load_at(t + THETA * dt)
            return jax.scipy.linalg.lu_solve((lu, piv), rhs), None

        ts = jnp.arange(n_steps) * dt
        uT, _ = jax.lax.scan(step, u0, ts)  # ONE compiled time loop

        u_full = V.solution_tensor().at[
            V._basis_parameters["inner_dofs"], :
        ].set(uT)
        uh, _ = V.interpolate(V, u_full)
        err2 = (uh - exact(x, y, T_END)) ** 2
        l2 = float(jnp.sqrt(V.integrate_functional(lambda b: err2).sum()))
        rate = "" if prev is None else f"  rate {math.log2(prev / l2):.2f}"
        print(
            f"n={n:4d} dt={dt:.4f} steps={n_steps:5d}  "
            f"L2(T) error {l2:.4e}{rate}"
        )
        prev = l2


if __name__ == "__main__":
    main()
