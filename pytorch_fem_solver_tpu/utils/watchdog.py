"""Fail-fast watchdog for scripts that touch the tunneled TPU.

The axon tunnel has a documented outage mode (CLAUDE.md): when it is down,
ANY device touch enters a silent sleep-retry loop (~0% CPU) that never
returns.  A benchmark with no deadline then converts a tunnel outage into
``rc=124, parsed=null`` — zero captured evidence (this is exactly what
happened to BENCH_r02.json).

``Watchdog`` runs a daemon thread that force-exits the process with a
single structured JSON line on stdout if an armed phase exceeds its
deadline.  Usage::

    wd = Watchdog(metric="my_metric")
    wd.arm(240, "tpu warmup (compile + first run)")
    ...  # device-touching work
    wd.disarm()

The emitted JSON matches the bench schema (``metric``/``value``/``unit``/
``vs_baseline``) with ``value: null`` and an ``error`` field, so the driver
records a structured failure instead of a timeout.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time


class Watchdog:
    def __init__(self, metric: str = "watchdog", extra: dict | None = None):
        self.metric = metric
        self.extra = extra or {}
        self._lock = threading.Lock()
        self._deadline: float | None = None
        self._label = ""
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def arm(self, seconds: float, label: str) -> None:
        """(Re)start the countdown: die with an error JSON after *seconds*."""
        with self._lock:
            self._deadline = time.monotonic() + seconds
            self._label = label
            self._seconds = seconds

    def disarm(self) -> None:
        with self._lock:
            self._deadline = None

    def _loop(self) -> None:
        while True:
            time.sleep(1.0)
            with self._lock:
                deadline, label = self._deadline, self._label
            if deadline is not None and time.monotonic() > deadline:
                result = {
                    "metric": self.metric,
                    "value": None,
                    "unit": "s",
                    "vs_baseline": None,
                    "error": (
                        f"watchdog: '{label}' exceeded "
                        f"{self._seconds:.0f}s — axon tunnel down? "
                        "(silent sleep-retry outage mode)"
                    ),
                    **self.extra,
                }
                print(json.dumps(result), flush=True)
                print(
                    f"WATCHDOG FIRED: {result['error']}",
                    file=sys.stderr,
                    flush=True,
                )
                os._exit(3)


def probe_device(wd: Watchdog, seconds: float = 90.0) -> float:
    """Fast tunnel-liveness probe: one tiny device op + host copy.

    Arms *wd* for *seconds*; if the tunnel is in its outage mode the probe
    never completes and the watchdog emits the structured failure.  Returns
    the probe round-trip time.
    """
    import numpy as np

    wd.arm(seconds, f"device liveness probe ({seconds:.0f}s)")
    t0 = time.perf_counter()
    import jax.numpy as jnp

    np.asarray(jnp.zeros((8,)) + 1.0)
    dt = time.perf_counter() - t0
    wd.disarm()
    return dt
