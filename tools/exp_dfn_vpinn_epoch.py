"""Flagship DFN RVPINN epoch on chip: seven-fractures network training time.

Times ONE epoch of the examples/example_seven_fractures_vpinn.py workload
(3D-input MLP against the glued P1 test space of the full benchmark DFN,
Gram-preconditioned residual loss + weak-BC penalty + H1-vs-FEM metric)
on the real TPU, both per-dispatch (eager Model.train) and as a scanned
epoch block (Model.train_compiled protocol). Prints one JSON line.

Usage: python tools/exp_dfn_vpinn_epoch.py [h ...]   (default 0.25 0.1)
Knobs: DFN_EPOCHS (block length, default 20), DFN_GRAM (cholesky|pcg).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_fem_solver_tpu.utils.watchdog import Watchdog, probe_device

WD = Watchdog(metric="dfn_rvpinn_epoch")
EPOCHS = int(os.environ.get("DFN_EPOCHS", "20"))
GRAM = os.environ.get("DFN_GRAM", "cholesky")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def epoch_times(h: float):
    import jax
    import jax.numpy as jnp
    import optax

    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.utils import build_benchmark_network

    mesh = build_benchmark_network(h=h)
    V = fem.FractureNetworkBasis(mesh, fem.ElementTri(1, 2))
    log(f"h={h}: {mesh.n_cells} cells, {V.n_dofs} global DOFs")

    a_form = lambda b: b.v_grad @ jnp.matrix_transpose(b.v_grad)

    WD.arm(600, f"FEM oracle solve h={h}")
    u_fem = V.solve_iterative(
        V.integrate_bilinear_form_local(a_form),
        V.integrate_linear_form(lambda b: b.v),
        tol=1e-6,
        precondition="two_level",
    )
    I_fem, I_fem_grad = V.interpolate(V, u_fem)
    fem_norm = jnp.sqrt(
        V.integrate_functional(
            lambda b, u, g: u**2 + (g**2).sum(-1, keepdims=True),
            I_fem,
            I_fem_grad,
        ).sum()
    )

    nn = fem.FeedForwardNeuralNetwork(
        input_dimension=3,
        output_dimension=1,
        nb_hidden_layers=4,
        neurons_per_layers=24,
        final_layer_scale=0.05,
    )
    markers = np.asarray(mesh["global", "markers"])[:, 0]
    boundary_nodes = jnp.asarray(
        np.asarray(mesh["global", "vertices_3d"])[markers == 1]
    )

    def residual(basis, net):
        pts = basis.integration_points
        return basis.v - (
            basis.v_grad @ jnp.matrix_transpose(net.gradient(pts))
        )

    # dense Cholesky above ~5k DOFs blows the axon remote-compile payload
    # limit (the factor becomes an O(n^2) jit constant -> HTTP 413, same
    # failure class as bench.py's big_tables); the matrix-free custom-vjp
    # pcg gram solver is O(nnz) and the intended scalable path
    gram = GRAM if V.n_dofs <= 5000 else "pcg"
    log(f"  gram solver: {gram}")
    gram_solve = V.gram_solver(a_form, method=gram)

    def h1_error_vs_fem(basis, net):
        pts = basis.integration_points
        cell_frac = basis.mesh["cells", "fracture"][:, 0]
        jac = basis.mesh["fracture_map", "jacobian"][cell_frac][:, None]
        inv = basis.mesh["fracture_map", "inv_jacobian"][cell_frac][:, None]
        tangent = net.gradient(pts) @ (jac @ inv)
        return (net(pts) - I_fem) ** 2 + ((tangent - I_fem_grad) ** 2).sum(
            -1, keepdims=True
        )

    def training_step(net, x_prev=None):
        r = V.reduce(V.integrate_linear_form(residual, net))
        x = gram_solve(r) if x_prev is None else gram_solve(r, x_prev)
        weak = (r.T @ x)[0, 0]
        bc = jnp.mean(net(boundary_nodes) ** 2)
        loss = weak + 50.0 * bc
        h1 = jnp.sqrt(V.integrate_functional(h1_error_vs_fem, net).sum())
        return loss, (jnp.sqrt(weak) / fem_norm, h1 / fem_norm, x)

    tx = optax.adam(1e-3)
    opt0 = tx.init(nn)

    @jax.jit
    def step(net, opt):
        (loss, aux), grads = jax.value_and_grad(
            training_step, has_aux=True
        )(net)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(net, updates), opt, loss, aux[0], aux[1]

    # warm variant: the previous epoch's Gram solution seeds the inner PCG
    # (gradient-free via stop_gradient inside gram_solve) — the round-5
    # VERDICT item-3 A/B against the cold-started step above
    @jax.jit
    def step_warm(net, opt, x_prev):
        (loss, aux), grads = jax.value_and_grad(
            training_step, has_aux=True
        )(net, x_prev)
        updates, opt = tx.update(grads, opt)
        return (
            optax.apply_updates(net, updates), opt, loss, aux[0], aux[1],
            aux[2],
        )

    WD.arm(600, f"eager warmup h={h}")
    net, opt, loss, rel, acc = step(nn, opt0)
    _ = float(loss)
    WD.arm(120 * EPOCHS, f"eager epochs h={h}")
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        net, opt, loss, rel, acc = step(net, opt)
    final = float(loss)
    dt_eager = (time.perf_counter() - t0) / EPOCHS
    log(f"  eager: {dt_eager*1e3:.2f} ms/epoch  loss {final:.4e}")

    def body(carry, _):
        net, opt = carry
        net, opt, loss, rel, acc = step(net, opt)
        return (net, opt), loss

    @jax.jit
    def block(net, opt):
        return jax.lax.scan(body, (net, opt), None, length=EPOCHS)

    WD.arm(600, f"scan warmup h={h}")
    _, losses = block(nn, opt0)
    _ = np.asarray(losses)
    WD.arm(120 * EPOCHS, f"scan epochs h={h}")
    t0 = time.perf_counter()
    _, losses = block(nn, opt0)
    losses = np.asarray(losses)
    dt_scan = (time.perf_counter() - t0) / EPOCHS
    log(f"  scanned: {dt_scan*1e3:.2f} ms/epoch  loss {losses[-1]:.4e}")
    assert np.isfinite(losses).all()

    dt_eager_warm = dt_scan_warm = None
    loss_warm = None
    if gram == "pcg":
        x_init = jnp.zeros_like(
            V.reduce(V.integrate_linear_form(residual, nn))
        )

        WD.arm(600, f"eager warm warmup h={h}")
        net, opt, loss, rel, acc, x = step_warm(nn, opt0, x_init)
        _ = float(loss)
        WD.arm(120 * EPOCHS, f"eager warm epochs h={h}")
        t0 = time.perf_counter()
        net, opt, x = nn, opt0, x_init
        for _ in range(EPOCHS):
            net, opt, loss, rel, acc, x = step_warm(net, opt, x)
        final_warm = float(loss)
        dt_eager_warm = (time.perf_counter() - t0) / EPOCHS
        log(f"  eager warm: {dt_eager_warm*1e3:.2f} ms/epoch  "
            f"loss {final_warm:.4e}")

        def body_warm(carry, _):
            net, opt, x = carry
            net, opt, loss, rel, acc, x = step_warm(net, opt, x)
            return (net, opt, x), loss

        @jax.jit
        def block_warm(net, opt):
            return jax.lax.scan(
                body_warm, (net, opt, x_init), None, length=EPOCHS
            )

        WD.arm(600, f"scan warm warmup h={h}")
        _, losses_w = block_warm(nn, opt0)
        _ = np.asarray(losses_w)
        WD.arm(120 * EPOCHS, f"scan warm epochs h={h}")
        t0 = time.perf_counter()
        _, losses_w = block_warm(nn, opt0)
        losses_w = np.asarray(losses_w)
        dt_scan_warm = (time.perf_counter() - t0) / EPOCHS
        loss_warm = float(losses_w[-1])
        log(f"  scanned warm: {dt_scan_warm*1e3:.2f} ms/epoch  "
            f"loss {loss_warm:.4e}  "
            f"dloss {abs(loss_warm - losses[-1]):.2e}")
        assert np.isfinite(losses_w).all()

    WD.disarm()
    return {
        "h": h,
        "cells": int(mesh.n_cells),
        "n_dofs": int(V.n_dofs),
        "epochs": EPOCHS,
        "s_per_epoch_eager": dt_eager,
        "s_per_epoch_scanned": dt_scan,
        "s_per_epoch_eager_warm": dt_eager_warm,
        "s_per_epoch_scanned_warm": dt_scan_warm,
        "final_loss": float(losses[-1]),
        "final_loss_warm": loss_warm,
    }


def main():
    rtt = probe_device(WD, 240)
    log(f"tunnel probe: {rtt:.1f}s")
    hs = [float(a) for a in sys.argv[1:]] or [0.25, 0.1]
    rows = [epoch_times(h) for h in hs]
    print(
        json.dumps(
            {"metric": "dfn_rvpinn_epoch", "gram": GRAM, "rows": rows}
        )
    )


if __name__ == "__main__":
    main()
