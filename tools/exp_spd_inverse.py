"""Micro-A/B: where does the dense coarse inverse go at nc=3248?

In-jit chained fori_loop (each iteration perturbs the input with the
previous output so XLA can neither hoist nor CSE), one host sync at the
end — the same protocol as tools/exp_pcg_breakdown.py. A first version
of this tool timed per-dispatch and reported ~5x inflated numbers
(dispatch overhead over the axon tunnel dominates sub-100-ms programs).

Variants: lu (jnp.linalg.inv), chol (factor only), chol+trsm,
chol_full (current spd_inverse), bf16-gemm tail (L^-T @ L^-1 in bf16,
f32 accumulate).

Usage: python tools/exp_spd_inverse.py [n ...]  (default 3248;
knob PROF_REPS, default 20)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(os.environ.get("PROF_REPS", "20"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.scipy.linalg import solve_triangular

    sizes = [int(a) for a in sys.argv[1:]] or [3248]
    for n in sizes:
        rng = np.random.default_rng(0)
        m = rng.standard_normal((n, n)).astype(np.float32) / np.sqrt(n)
        a = jnp.asarray(m @ m.T + np.eye(n, dtype=np.float32))
        eye = jnp.eye(n, dtype=jnp.float32)

        def lu(ai):
            return jnp.linalg.inv(ai)

        def chol_only(ai):
            return jnp.linalg.cholesky(ai)

        def chol_trsm(ai):
            l = jnp.linalg.cholesky(ai)
            return solve_triangular(l, eye, lower=True)

        def chol_full(ai):
            l = jnp.linalg.cholesky(ai)
            li = solve_triangular(l, eye, lower=True)
            return li.T @ li

        def chol_bf16gemm(ai):
            l = jnp.linalg.cholesky(ai)
            li = solve_triangular(l, eye, lower=True)
            lib = li.astype(jnp.bfloat16)
            return jnp.matmul(lib.T, lib, preferred_element_type=jnp.float32)

        ref = None
        for name, fn in [
            ("lu", lu),
            ("chol_only", chol_only),
            ("chol_trsm", chol_trsm),
            ("chol_full", chol_full),
            ("chol_bf16gemm", chol_bf16gemm),
        ]:

            @jax.jit
            def looped(a, fn=fn):
                def body(_, carry):
                    s, _ = carry
                    out = fn(a + s * eye)
                    return out.ravel()[0] * 1e-30, out

                return jax.lax.fori_loop(
                    0, REPS, body, (jnp.float32(0.0), jnp.zeros_like(a))
                )

            s, out = looped(a)
            rh = np.asarray(out)  # compile + sync
            t0 = time.perf_counter()
            s, out = looped(a)
            np.asarray(s)
            dt = (time.perf_counter() - t0) / REPS
            extra = ""
            if name == "chol_full":
                ref = rh
            if name == "chol_bf16gemm" and ref is not None:
                rel = np.linalg.norm(rh - ref) / np.linalg.norm(ref)
                extra = f"  rel-vs-f32 {rel:.2e}"
            print(f"  n={n} {name}: {dt*1e3:.2f} ms{extra}", flush=True)


if __name__ == "__main__":
    main()
