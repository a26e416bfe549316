"""Secondary benchmark: RVPINN epoch throughput, TPU vs the ACTUAL reference.

Workload: the reference's flagship `examples/example_weak.py` epoch — NN
forward + input-gradient at all quadrature points, weighted scatter into the
residual vector, Gram-preconditioned loss, relative-loss + H1-accuracy
metrics, double backward, Adam step.

The CPU baseline drives the REAL reference package at /root/reference — its
``Model.train`` (torch_fem/model/model.py:61-99), ``Basis`` assembly and
TorchScript MLP — on the same mesh, widths and epoch count (tensordict is
not installed here, so a minimal shim, tools/tensordict_shim.py, stands in;
the timed code is all reference code). The TPU side runs this framework
with the identical training_step math inside one jit.

Not run by the driver (bench.py is the primary metric); prints one JSON
line for the record.
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
THREADS = int(os.environ.get("VPINN_CPU_THREADS", str(os.cpu_count() or 8)))
# Fail-fast deadlines (s), same doctrine as bench.py: a tunnel outage hangs
# every device touch in a silent sleep-retry loop; the watchdog converts
# that to a structured error JSON + rc=3 instead of rc=124 with no output.
PROBE_S = float(os.environ.get("VPINN_PROBE_S", "240"))
WARMUP_S = float(os.environ.get("VPINN_WARMUP_S", "600"))
EPOCH_S = float(os.environ.get("VPINN_EPOCH_S", "300"))

from pytorch_fem_solver_tpu.utils.watchdog import Watchdog, probe_device

WD = Watchdog(metric="rvpinn_epoch_wallclock")


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

    def exact(x, y):
        return jnp.sin(math.pi * x) * jnp.sin(math.pi * y)

    def exact_dx(x, y):
        return math.pi * jnp.cos(math.pi * x) * jnp.sin(math.pi * y)

    def exact_dy(x, y):
        return math.pi * jnp.sin(math.pi * x) * jnp.cos(math.pi * y)

    def h1_exact(basis):
        x, y = basis.integration_points[..., 0:1], basis.integration_points[..., 1:2]
        return exact(x, y) ** 2 + exact_dx(x, y) ** 2 + exact_dy(x, y) ** 2

    exact_norm = jnp.sqrt(jnp.sum(V.integrate_functional(h1_exact)))

    def residual(basis, gradient):
        pts = basis.integration_points
        x, y = pts[..., 0:1], pts[..., 1:2]
        rhs = 2.0 * math.pi**2 * jnp.sin(math.pi * x) * jnp.sin(math.pi * y)
        return rhs * basis.v - (basis.v_grad @ jnp.matrix_transpose(gradient(pts)))

    def h1_norm(basis, net, gradient):
        pts = basis.integration_points
        x, y = pts[..., 0:1], pts[..., 1:2]
        g = gradient(pts)
        return (
            (exact(x, y) - net(pts)) ** 2
            + (exact_dx(x, y) - g[..., 0:1]) ** 2
            + (exact_dy(x, y) - g[..., 1:2]) ** 2
        )

    tx = optax.adam(1e-3)
    opt_state = tx.init(nn)

    # the full example_weak training step: loss + the two metrics the
    # reference computes every epoch (same work on both sides)
    @jax.jit
    def step(net, opt_state):
        def loss_fn(net):
            r = V.reduce(V.integrate_linear_form(residual, net.gradient))
            return (r.T @ (gram_inv @ r))[0, 0]

        loss, grads = jax.value_and_grad(loss_fn)(net)
        relative = jnp.sqrt(loss) / exact_norm**2
        h1_err = jnp.sqrt(
            jnp.sum(V.integrate_functional(h1_norm, net, net.gradient))
        )
        updates, opt_state = tx.update(grads, opt_state)
        return (
            optax.apply_updates(net, updates),
            opt_state,
            loss,
            relative,
            h1_err / exact_norm,
        )

    if WARMUP_S:
        WD.arm(WARMUP_S, "tpu warmup (compile + first epoch)")
    nn, opt_state, loss, rel, acc = step(nn, opt_state)
    _ = float(loss)  # sync
    if EPOCH_S:
        WD.arm(EPOCH_S * EPOCHS, "tpu per-dispatch epochs")
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        nn, opt_state, loss, rel, acc = step(nn, opt_state)
    final = float(loss)  # forces the host sync axon needs
    dt = (time.perf_counter() - t0) / EPOCHS
    log(
        f"tpu (per-dispatch): {dt*1e3:.2f} ms/epoch  loss {final:.4e} "
        f"acc {float(acc):.4f}  cells {mesh.n_cells}"
    )

    # the TPU-native protocol (Model.train_compiled): lax.scan over the
    # epoch block inside ONE jit — removes the ~31 ms per-dispatch tunnel
    # round-trip that dominates the eager loop at this problem size
    def epoch_body(carry, _):
        net, opt = carry
        net, opt, loss, rel, acc = step(net, opt)  # nested jit inlines
        return (net, opt), (loss, rel, acc)

    import jax.lax as lax

    @jax.jit
    def run_block(net, opt):
        return lax.scan(epoch_body, (net, opt), None, length=EPOCHS)

    if WARMUP_S:
        WD.arm(WARMUP_S, "tpu scanned-block warmup")
    (nn_s, opt_s), (losses, _, accs) = run_block(nn, opt_state)
    _ = np.asarray(losses)  # sync
    if EPOCH_S:
        WD.arm(EPOCH_S * EPOCHS, "tpu scanned-block epochs")
    t0 = time.perf_counter()
    (nn_s, opt_s), (losses, _, accs) = run_block(nn, opt_state)
    losses = np.asarray(losses)  # sync
    WD.disarm()
    dt_scan = (time.perf_counter() - t0) / EPOCHS
    log(
        f"tpu (scanned block): {dt_scan*1e3:.2f} ms/epoch  "
        f"loss {losses[-1]:.4e}"
    )
    return dt, dt_scan, mesh.n_cells


def _reference_mesh_dict():
    """The same mesh as the TPU side, in triangle-library key layout
    (incl. unique edges + cell neighbors so the reference takes its O(E)
    topology path, abstract_mesh.py:207-230)."""
    import pytorch_fem_solver_tpu as fem
    from pytorch_fem_solver_tpu.mesh.topology import build_tri_topology

    tri = fem.unit_square(n=N)
    verts = np.asarray(tri["vertices"], dtype=np.float64)
    cells = np.asarray(tri["triangles"], dtype=np.int64)
    markers = np.asarray(tri["vertex_markers"], dtype=np.int64)
    topo = build_tri_topology(verts, cells, markers)

    # neighbors (T, 3), -1-padded: the reference only uses -1 vs not
    T = cells.shape[0]
    neighbors = -np.ones((T, 3), dtype=np.int64)
    fill = np.zeros(T, dtype=np.int64)
    for a, b in np.asarray(topo["interior_edges_cells"]):
        neighbors[a, fill[a]] = b
        fill[a] += 1
        neighbors[b, fill[b]] = a
        fill[b] += 1

    return {
        "vertices": verts,
        "vertex_markers": markers.reshape(-1, 1).astype(np.int32),
        "triangles": cells.astype(np.int32),
        "edges": np.asarray(topo["edges_vertices"], dtype=np.int32),
        "edge_markers": np.asarray(topo["edges_markers"], dtype=np.int32),
        "neighbors": neighbors.astype(np.int32),
    }


def reference_epoch_time(n_cells_expected):
    """Drive the actual /root/reference package as the CPU baseline."""
    import torch

    torch.set_num_threads(THREADS)
    torch.set_default_dtype(torch.float32)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import tools.tensordict_shim as tensordict_shim

    sys.modules.setdefault("tensordict", tensordict_shim)
    sys.path.insert(0, "/root/reference")
    from torch_fem import (  # noqa: E402 — the real reference package
        Basis,
        ElementTri,
        FeedForwardNeuralNetwork,
        MeshTri,
        Model,
    )

    mesh = MeshTri(triangulation=_reference_mesh_dict())
    basis = Basis(mesh, ElementTri(polynomial_order=1, integration_order=4))
    assert basis.v_grad.shape[0] == n_cells_expected, "mesh mismatch"

    class BoundaryConstrain(torch.nn.Module):
        def forward(self, inputs):
            x, y = torch.split(inputs, 1, dim=-1)
            return x * (x - 1) * y * (y - 1)

    gram_inv = torch.inverse(
        basis.reduce(
            basis.integrate_bilinear_form(lambda b: b.v_grad @ b.v_grad.mT)
        )
    )

    def exact(x, y):
        return torch.sin(math.pi * x) * torch.sin(math.pi * y)

    def exact_dx(x, y):
        return math.pi * torch.cos(math.pi * x) * torch.sin(math.pi * y)

    def exact_dy(x, y):
        return math.pi * torch.sin(math.pi * x) * torch.cos(math.pi * y)

    def h1_exact(b):
        x, y = torch.split(b.integration_points, 1, dim=-1)
        return exact(x, y) ** 2 + exact_dx(x, y) ** 2 + exact_dy(x, y) ** 2

    exact_norm = torch.sqrt(torch.sum(basis.integrate_functional(h1_exact)))

    def residual(b, gradient):
        pts = b.integration_points
        x, y = torch.split(pts, 1, dim=-1)
        rhs = 2.0 * math.pi**2 * torch.sin(math.pi * x) * torch.sin(math.pi * y)
        return rhs * b.v - (b.v_grad @ gradient(pts).mT)

    def h1_norm(b, net, gradient):
        pts = b.integration_points
        x, y = torch.split(pts, 1, dim=-1)
        dx, dy = torch.split(gradient(pts), 1, dim=-1)
        return (
            (exact(x, y) - net(pts)) ** 2
            + (exact_dx(x, y) - dx) ** 2
            + (exact_dy(x, y) - dy) ** 2
        )

    def training_step(net):
        r = basis.reduce(basis.integrate_linear_form(residual, net.gradient))
        loss = r.T @ (gram_inv @ r)
        relative = torch.sqrt(loss) / exact_norm**2
        h1_err = torch.sqrt(
            torch.sum(basis.integrate_functional(h1_norm, net, net.gradient))
        )
        return loss, relative, h1_err / exact_norm

    def make_model(epochs):
        nn = FeedForwardNeuralNetwork(
            input_dimension=2,
            output_dimension=1,
            nb_hidden_layers=DEPTH,
            neurons_per_layers=WIDTH,
            boundary_condition_modifier=BoundaryConstrain(),
        )
        return Model(neural_network=nn, training_step=training_step, epochs=epochs)

    make_model(3).train()  # warms TorchScript compilation caches

    model = make_model(EPOCHS)
    t0 = time.perf_counter()
    model.train()
    dt = (time.perf_counter() - t0) / EPOCHS
    final = model.get_training_history()[0][-1]
    log(f"reference-cpu: {dt*1e3:.2f} ms/epoch  loss {final:.4e}  threads {THREADS}")
    return dt


def main():
    if PROBE_S:
        rtt = probe_device(WD, PROBE_S)
        log(f"tunnel probe: first device op round-trip {rtt:.1f}s")
    tpu_dt, tpu_scan_dt, n_cells = tpu_epoch_time()
    cpu_dt = reference_epoch_time(n_cells)
    print(
        json.dumps(
            {
                "metric": "rvpinn_epoch_wallclock",
                # headline: the TPU-native protocol (scanned epoch block,
                # Model.train_compiled); the per-dispatch eager loop is in
                # detail for round-over-round comparability
                "value": tpu_scan_dt,
                "unit": "s",
                "vs_baseline": cpu_dt / tpu_scan_dt,
                "detail": {
                    "mesh_n": N,
                    "cells": n_cells,
                    "epochs": EPOCHS,
                    "width": WIDTH,
                    "depth": DEPTH,
                    "tpu_s_per_epoch_eager": tpu_dt,
                    "cpu_s_per_epoch": cpu_dt,
                    "cpu_threads": THREADS,
                    "baseline": "actual reference package Model.train "
                    "(torch_fem/model/model.py:61-99) via tensordict shim",
                },
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("VPINN_CHILD") == "1" or not int(
        os.environ.get("VPINN_SUPERVISE", "1")
    ):
        main()
    else:
        # same retry-with-backoff supervisor as bench.py (VERDICT r04 item 1)
        from pytorch_fem_solver_tpu.utils.watchdog import supervise

        sys.exit(
            supervise(
                "rvpinn_epoch_wallclock",
                child_flag="VPINN_CHILD",
                env_prefix="VPINN",
            )
        )
