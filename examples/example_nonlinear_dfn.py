"""Nonlinear flow on the seven-fractures network: compiled Newton on a DFN.

Solves the saturation-dependent diffusion problem

    -div_t ((k0 + u^2) grad_t u) = 1  on every fracture,  u = 0 on the
    outer boundary, pressure continuity across traces by DOF gluing

on the seven-fractures benchmark geometry, with the ENTIRE damped Newton
iteration (tangential-gradient residual assembly, jvp consistent
Jacobians, BiCGStab updates) compiled into one XLA program per solve
(``FractureNetworkBasis.compiled_newton``). The nonlinearity k(u) = k0 +
u^2 raises conductivity where pressure is high, flattening the peak
relative to the linear solve — the printed per-fracture statistics show
it. The reference has neither nonlinear solves nor a script for this
staged geometry.

Knobs: FEM_H (target edge length, default 0.15), FEM_K0 (base
conductivity, default 0.5).
"""

import os

import common  # noqa: F401  (configures CPU/x64 example defaults)
import jax.numpy as jnp
import numpy as np

import pytorch_fem_solver_tpu as fem
from pytorch_fem_solver_tpu.utils import build_benchmark_network

H = float(os.environ.get("FEM_H", 0.15))
K0 = float(os.environ.get("FEM_K0", 0.5))


def residual(b, u, ug):
    kappa = K0 + u**2
    return kappa * (b.v_grad * ug).sum(-1, keepdims=True) - b.v


def main():
    mesh = build_benchmark_network(h=H)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    print(
        f"seven fractures at h={H}: {mesh.n_cells} cells, {V.n_dofs} DOFs, "
        f"k(u) = {K0} + u^2"
    )

    u_lin = V.solve_iterative(
        V.integrate_bilinear_form_local(
            lambda b: K0 * b.v_grad @ jnp.matrix_transpose(b.v_grad)
        ),
        V.integrate_linear_form(lambda b: b.v),
        tol=1e-10,
        precondition="two_level",
    )

    solve = V.compiled_newton(residual, tol=1e-10)
    u, (iters, res, conv) = solve()
    assert bool(conv), f"Newton did not converge: residual {res}"
    print(f"Newton: {int(iters)} iterations, residual {float(res):.2e}")

    u_np = np.asarray(u)[:, 0]
    ul_np = np.asarray(u_lin)[:, 0]
    print(
        f"max u: nonlinear {u_np.max():.6f} vs linear {ul_np.max():.6f} "
        "(stiffening flattens the peak)"
    )
    vert_fracture = np.asarray(mesh["vertices", "fracture"])[:, 0]
    vert_global = np.asarray(mesh["global", "ids"])[:, 0]
    for f in range(mesh.n_fractures):
        vals = u_np[vert_global[vert_fracture == f]]
        print(f"  fracture {f}: mean u = {vals.mean():.6f}  max = {vals.max():.6f}")


if __name__ == "__main__":
    main()
