"""Probe: which in-kernel gather formulations lower on this TPU/Mosaic?

Tiny shapes, one pallas_call per variant, exceptions reported per variant.

Usage: python tools/exp_pallas_gather_probe.py
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    nb, k, TILE, B = 256, 8, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(nb, k)).astype(np.float32))
    cols = jnp.asarray(rng.integers(0, nb, size=(nb, B)).astype(np.int32))
    want = np.asarray(x)[np.asarray(cols)]  # (nb, B, k)

    def run(name, kernel, out_shape, check=None):
        try:
            y = pl.pallas_call(
                kernel,
                grid=(nb // TILE,),
                in_specs=[
                    pl.BlockSpec((TILE, B), lambda i: (i, 0)),
                    pl.BlockSpec((nb, k), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((TILE,) + out_shape, lambda i: (i,) + (0,) * len(out_shape)),
                out_shape=jax.ShapeDtypeStruct((nb,) + out_shape, jnp.float32),
            )(cols, x)
            y = np.asarray(y)
            err = np.abs(y - check).max() if check is not None else float("nan")
            print(f"{name:28s} OK  err={err:.2e}", flush=True)
        except Exception as e:
            msg = f"{type(e).__name__}: {e}".replace("\n", " ")[:220]
            print(f"{name:28s} FAIL {msg}", flush=True)

    # 1: jnp.take rows
    def k_take(cols_ref, x_ref, out_ref):
        c = cols_ref[...].reshape(-1)
        g = jnp.take(x_ref[...], c, axis=0)  # (TILE*B, k)
        out_ref[...] = g.reshape(TILE, B * k)

    run("take(rows)", k_take, (B * k,), want.reshape(nb, B * k))

    # 2: take_along_axis with broadcast indices
    def k_taa(cols_ref, x_ref, out_ref):
        c = cols_ref[...].reshape(-1)  # (TILE*B,)
        idx = jnp.broadcast_to(c[:, None], (TILE * B, k))
        g = jnp.take_along_axis(x_ref[...], idx, axis=0)
        out_ref[...] = g.reshape(TILE, B * k)

    run("take_along_axis(bcast)", k_taa, (B * k,), want.reshape(nb, B * k))

    # 3: plain advanced indexing
    def k_idx(cols_ref, x_ref, out_ref):
        c = cols_ref[...].reshape(-1)
        g = x_ref[...][c]
        out_ref[...] = g.reshape(TILE, B * k)

    run("x[c] indexing", k_idx, (B * k,), want.reshape(nb, B * k))

    # 4: fori_loop of dynamic slices (scalar loop; correctness reference)
    def k_loop(cols_ref, x_ref, out_ref):
        def body(r, _):
            def inner(b_, _):
                c = cols_ref[r, b_]
                out_ref[r, b_ * k : (b_ + 1) * k] = x_ref[pl.ds(c, 1), :][0]
                return 0

            jax.lax.fori_loop(0, B, inner, 0)
            return 0

        jax.lax.fori_loop(0, TILE, body, 0)

    run("fori dynamic slices", k_loop, (B * k,), want.reshape(nb, B * k))


if __name__ == "__main__":
    main()
