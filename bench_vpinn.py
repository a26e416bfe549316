"""Secondary benchmark: RVPINN epoch throughput, TPU vs reference-style torch-CPU.

The reference's per-epoch hot loop (SURVEY.md §3.3) is: NN forward +
input-gradient at all quadrature points, weighted scatter into the residual
vector, Gram-preconditioned loss, double backward, Adam step. This script
times that epoch on (a) this framework on the TPU (whole step in one jit)
and (b) an equivalent torch-CPU implementation mirroring the reference's
``Model.train`` structure (torch.jit.script-ed MLP like model.py:27,
autograd.grad with create_graph, index_put_ scatter).

Not run by the driver (bench.py is the primary metric); prints one JSON line
for the record.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

N = int(os.environ.get("VPINN_N", "64"))  # unit-square mesh resolution
EPOCHS = int(os.environ.get("VPINN_EPOCHS", "50"))
WIDTH = int(os.environ.get("VPINN_WIDTH", "15"))
DEPTH = int(os.environ.get("VPINN_DEPTH", "4"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def tpu_epoch_time():
    import jax
    import jax.numpy as jnp
    import optax

    import pytorch_fem_solver_tpu as fem

    def bc(inputs):
        x, y = inputs[..., 0:1], inputs[..., 1:2]
        return x * (x - 1) * y * (y - 1)

    mesh = fem.MeshTri(fem.unit_square(n=N))
    V = fem.Basis(mesh, fem.ElementTri(1, 4))
    nn = fem.FeedForwardNeuralNetwork(
        2, 1, DEPTH, WIDTH, boundary_condition_modifier=bc
    )

    gram_inv = jnp.linalg.inv(
        V.reduce(
            V.integrate_bilinear_form(
                lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
            )
        )
    )

    def residual(basis, gradient):
        pts = basis.integration_points
        x, y = pts[..., 0:1], pts[..., 1:2]
        rhs = 2.0 * math.pi**2 * jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
        return rhs * basis.v - (basis.v_grad @ jnp.matrix_transpose(gradient(pts)))

    tx = optax.adam(1e-3)
    opt_state = tx.init(nn)

    @jax.jit
    def step(net, opt_state):
        def loss_fn(net):
            r = V.reduce(V.integrate_linear_form(residual, net.gradient))
            return (r.T @ (gram_inv @ r))[0, 0]

        loss, grads = jax.value_and_grad(loss_fn)(net)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(net, updates), opt_state, loss

    nn, opt_state, loss = step(nn, opt_state)
    _ = float(loss)  # sync
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        nn, opt_state, loss = step(nn, opt_state)
    final = float(loss)  # sync
    dt = (time.perf_counter() - t0) / EPOCHS
    log(f"tpu: {dt*1e3:.2f} ms/epoch  loss {final:.4e}  cells {mesh.n_cells}")
    return dt, mesh.n_cells


def cpu_epoch_time(n_cells_expected):
    import torch

    torch.set_num_threads(os.cpu_count() or 8)
    torch.set_default_dtype(torch.float32)

    import pytorch_fem_solver_tpu as fem

    # same mesh/quadrature data, reference-style torch pipeline
    mesh = fem.MeshTri(fem.unit_square(n=N))
    V = fem.Basis(mesh, fem.ElementTri(1, 4))
    pts = torch.tensor(np.asarray(V.integration_points, dtype=np.float32))
    v = torch.tensor(np.asarray(V.v, dtype=np.float32))
    v_grad = torch.tensor(np.asarray(V.v_grad, dtype=np.float32))
    dx = torch.tensor(np.asarray(V._dx, dtype=np.float32))
    dofs = torch.tensor(
        np.asarray(V._global_dofs4elements).astype(np.int64)
    )
    inner = torch.tensor(
        np.asarray(V._basis_parameters["inner_dofs"]).astype(np.int64)
    )
    n_dofs = V.n_dofs
    assert mesh.n_cells == n_cells_expected, "CPU run rebuilt a different mesh"

    import jax.numpy as jnp

    gram_inv_np = np.asarray(
        jnp.linalg.inv(
            V.reduce(
                V.integrate_bilinear_form(
                    lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)
                )
            )
        ),
        dtype=np.float32,
    )
    gram_inv = torch.tensor(gram_inv_np)

    layers = []
    dims = [2] + [WIDTH] * (DEPTH + 1) + [1]
    for i, (a, b) in enumerate(zip(dims[:-1], dims[1:])):
        layers.append(torch.nn.Linear(a, b))
        if i < len(dims) - 2:
            layers.append(torch.nn.Tanh())

    class BCNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.net = torch.nn.Sequential(*layers)

        def forward(self, x):
            xx, yy = x[..., 0:1], x[..., 1:2]
            return self.net(x) * (xx * (xx - 1) * yy * (yy - 1))

    module = BCNet()
    scripted = torch.jit.script(module)  # the reference scripts its MLP
    net = module  # keep eager params for the optimizer

    def forward(x):
        return scripted(x)

    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    def epoch():
        opt.zero_grad()
        p = pts.clone().requires_grad_(True)
        out = forward(p)
        grad = torch.autograd.grad(
            [out], [p], grad_outputs=[torch.ones_like(out)], create_graph=True
        )[0]
        x, y = pts[..., 0:1], pts[..., 1:2]
        rhs = (
            2.0
            * math.pi**2
            * torch.sin(math.pi * x)
            * torch.sin(math.pi * y)
        )
        integrand = rhs * v - (v_grad @ grad.mT)
        local = (integrand * dx).sum(-3)
        r_full = torch.zeros(n_dofs, 1)
        r_full.index_put_(
            (dofs.reshape(-1),), local.reshape(-1, 1), accumulate=True
        )
        r = r_full[inner]
        loss = (r.T @ (gram_inv @ r))[0, 0]
        loss.backward()
        opt.step()
        return float(loss)

    epoch()  # warmup
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        final = epoch()
    dt = (time.perf_counter() - t0) / EPOCHS
    log(f"cpu: {dt*1e3:.2f} ms/epoch  loss {final:.4e}")
    return dt


def main():
    tpu_dt, n_cells = tpu_epoch_time()
    cpu_dt = cpu_epoch_time(n_cells)
    print(
        json.dumps(
            {
                "metric": "rvpinn_epoch_wallclock",
                "value": tpu_dt,
                "unit": "s",
                "vs_baseline": cpu_dt / tpu_dt,
                "detail": {
                    "mesh_n": N,
                    "cells": n_cells,
                    "epochs": EPOCHS,
                    "width": WIDTH,
                    "depth": DEPTH,
                    "cpu_s_per_epoch": cpu_dt,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
