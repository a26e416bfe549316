"""The bench watchdog must convert a hang into a structured JSON failure.

BENCH_r02.json recorded ``rc=124, parsed=null`` because the axon tunnel's
silent sleep-retry outage met a benchmark with no deadline.  These tests
assert the fail-fast contract: an armed phase that never completes exits
rc=3 with one parseable JSON line on stdout; a disarmed watchdog is inert.
"""

import json
import subprocess
import sys

SNIPPET_FIRE = """
import time
from pytorch_fem_solver_tpu.utils.watchdog import Watchdog
wd = Watchdog(metric="test_metric", extra={"phase": "unit"})
wd.arm(1.0, "simulated hang")
time.sleep(30)
print("UNREACHABLE")
"""

SNIPPET_DISARM = """
import time
from pytorch_fem_solver_tpu.utils.watchdog import Watchdog
wd = Watchdog(metric="test_metric")
wd.arm(5.0, "phase")
wd.disarm()
time.sleep(1.5)
print("survived")
"""


def test_watchdog_fires_with_structured_json():
    proc = subprocess.run(
        [sys.executable, "-c", SNIPPET_FIRE],
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert proc.returncode == 3
    assert "UNREACHABLE" not in proc.stdout
    line = proc.stdout.strip().splitlines()[-1]
    result = json.loads(line)
    assert result["metric"] == "test_metric"
    assert result["value"] is None
    assert "simulated hang" in result["error"]
    assert result["phase"] == "unit"


def test_watchdog_disarm_is_inert():
    proc = subprocess.run(
        [sys.executable, "-c", SNIPPET_DISARM],
        capture_output=True,
        text=True,
        timeout=30,
    )
    assert proc.returncode == 0
    assert "survived" in proc.stdout
