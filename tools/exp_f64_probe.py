"""Probe: which float64 ops does the axon TPU backend compile/execute?

docs/performance.md records "f64 LU does not compile on TPU"; round-5
VERDICT item 5 (mixed-precision iterative refinement: f32 two-level PCG
inner + f64 residual recomputation outer, one jit) needs to know whether
the f64 RESIDUAL PATH — elementwise, row gathers, the batched 8x8 einsum,
scatter-add — lowers at all, and at what cost multiple vs f32.

Each op is tried in its own jit with x64 enabled; failures are caught and
reported per-op. Timings use the host-copy sync (jax.block_until_ready is
a no-op under axon).

Usage: python tools/exp_f64_probe.py   (knob: PROBE_N, default 2**17)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("PROBE_N", str(2**17)))
REPS = 30


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pytorch_fem_solver_tpu.utils.watchdog import Watchdog, probe_device

    wd = Watchdog(metric="f64_probe")
    rtt = probe_device(wd, 240.0)
    log(f"tunnel probe: {rtt:.1f}s")

    rng = np.random.default_rng(0)
    nb = N // 8
    results = {}

    def bench(name, step):
        """step: (N,) carry -> (N,) carry, normalized so 30 powers of the
        op stay finite; the carry dependence stops XLA hoisting the op out
        of the timing loop."""
        wd.arm(300.0, f"probe {name}")
        try:
            def norm_step(c):
                y = step(c)
                return y * jax.lax.rsqrt(jnp.mean(y * y) + 1e-30)

            loops = jax.jit(
                lambda c: jax.lax.fori_loop(
                    0, REPS, lambda i, acc: norm_step(acc), c
                )
            )
            c0 = jnp.asarray(rng.normal(size=(N,)), dtype=dt)
            t0 = time.perf_counter()
            np.asarray(loops(c0))
            dt0 = time.perf_counter() - t0  # includes compile
            t0 = time.perf_counter()
            np.asarray(loops(c0))
            dt_op = (time.perf_counter() - t0) / REPS
            results[name] = {"ok": True, "s_per_op": dt_op}
            log(f"{name:24s} OK  {dt_op*1e6:9.1f} us/op (first {dt0:.1f}s)")
        except Exception as e:
            msg = f"{type(e).__name__}: {e}".replace("\n", " ")[:200]
            results[name] = {"ok": False, "error": msg}
            log(f"{name:24s} FAIL {msg}")
        finally:
            wd.disarm()

    for dt_name, dt in (("f32", jnp.float32), ("f64", jnp.float64)):
        x = jnp.asarray(rng.normal(size=(N,)), dtype=dt)
        v = jnp.asarray(rng.normal(size=(nb, 8, 8, 8)), dtype=dt)
        cols = jnp.asarray(rng.integers(0, nb, size=(nb, 8)), dtype=jnp.int32)
        idx = jnp.asarray(rng.permutation(N), dtype=jnp.int32)

        bench(f"{dt_name}_axpy", lambda c: c + 0.5 * x)
        bench(f"{dt_name}_dot", lambda c: c + jnp.sum(c * x))
        bench(
            f"{dt_name}_gather_rows",
            lambda c: c.reshape(nb, 8)[cols].sum(axis=1).reshape(-1),
        )
        bench(
            f"{dt_name}_bsr_einsum",
            lambda c: jnp.einsum(
                "rbij,rbj->ri", v, c.reshape(nb, 8)[cols]
            ).reshape(-1),
        )
        bench(
            f"{dt_name}_scatter_add",
            lambda c: jnp.zeros_like(c).at[idx].add(c),
        )
        bench(
            f"{dt_name}_cast_roundtrip",
            lambda c: c.astype(jnp.float32).astype(dt) + x,
        )

    print(json.dumps({"metric": "f64_probe", "n": N, "ops": results}))


if __name__ == "__main__":
    main()
