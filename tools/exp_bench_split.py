"""Split the benchmark wall-clock into setup vs per-iteration cost.

Runs the EXACT bench.py BSR program (assembly + aggblock preconditioner
setup + PCG) three times with forced iteration counts (tol=0, maxiter
pinned) and solves the linear system

    t(n_iters) = setup + n_iters * per_iteration

for the two unknowns. This separates the two optimization targets: the
~1.1 ms in-jit iteration floor (77% SpMV gather) vs everything that runs
once per solve (local integrate, symmetric scatter, smoother block
inverses, coarse Galerkin + dense inverse, transfers).

Usage: python tools/exp_bench_split.py  (knobs: BENCH_H, SPLIT_ITERS)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

H = os.environ.get("BENCH_H", "0.03")
ITERS = [int(x) for x in os.environ.get("SPLIT_ITERS", "2,102,302").split(",")]


def run_once(n_iters: int) -> float:
    env = dict(
        os.environ,
        BENCH_H=H,
        BENCH_TOL="0",
        BENCH_PCG_ITERS=str(n_iters),
        BENCH_SKIP_CPU="1",
        BENCH_REPEATS="5",
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if out.returncode != 0:
        print(out.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"bench.py rc={out.returncode} at iters={n_iters}")
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    t = rec["value"]
    print(
        f"iters={n_iters}: {t:.4f}s (spread {rec['detail']['tpu_time_spread_s']})",
        file=sys.stderr,
        flush=True,
    )
    return t


def main():
    ts = [run_once(n) for n in ITERS]
    # least squares on t = setup + n * per_iter
    import numpy as np

    A = np.stack([np.ones(len(ITERS)), np.asarray(ITERS, float)], axis=1)
    (setup, per_iter), *_ = np.linalg.lstsq(A, np.asarray(ts), rcond=None)
    print(
        json.dumps(
            {
                "metric": "bench_split",
                "h": float(H),
                "iters": ITERS,
                "times_s": ts,
                "setup_s": float(setup),
                "s_per_iteration": float(per_iter),
                "implied_at_72": float(setup + 72 * per_iter),
            }
        )
    )


if __name__ == "__main__":
    main()
