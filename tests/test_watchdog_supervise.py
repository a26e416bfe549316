"""Retry supervisor (utils/watchdog.py::supervise) behavior tests.

Round-4 postmortem (VERDICT.md item 1): the one-shot liveness probe nulled
the round's headline benchmark on a transient tunnel outage.  These tests
drive the supervisor with a scripted child that fails rc=3 (the watchdog's
outage signature) a configurable number of times, and assert that

- rc=3 failures are retried until the child succeeds (value recovered),
- non-watchdog failures (rc=1) are NOT retried,
- an exhausted window still emits the last structured error JSON.
"""

import json
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD_TEMPLATE = textwrap.dedent(
    """
    import json, os, sys
    sys.path.insert(0, {repo!r})
    if os.environ.get("BENCH_CHILD") == "1":
        cnt_file = sys.argv[1]
        n = int(open(cnt_file).read())
        open(cnt_file, "w").write(str(n + 1))
        if n < {fail_times}:
            print(json.dumps({{
                "metric": "t", "value": None, "unit": "s",
                "vs_baseline": None, "error": "simulated outage"}}))
            sys.exit({fail_rc})
        print(json.dumps({{
            "metric": "t", "value": 1.5, "unit": "s", "vs_baseline": 2.0}}))
        sys.exit(0)
    from pytorch_fem_solver_tpu.utils.watchdog import supervise
    sys.exit(supervise("t"))
    """
)


def _run(tmp_path, fail_times, fail_rc, max_attempts=8):
    script = tmp_path / "fake_bench.py"
    counter = tmp_path / "count.txt"
    counter.write_text("0")
    script.write_text(
        CHILD_TEMPLATE.format(repo=REPO, fail_times=fail_times, fail_rc=fail_rc)
    )
    env = dict(
        os.environ,
        BENCH_RETRY_BACKOFF_S="0.05",
        BENCH_RETRY_WINDOW_S="60",
        BENCH_MAX_ATTEMPTS=str(max_attempts),
    )
    proc = subprocess.run(
        [sys.executable, str(script), str(counter)],
        env=env,
        capture_output=True,
        timeout=120,
    )
    out = proc.stdout.decode().strip().splitlines()
    parsed = json.loads(out[-1]) if out else None
    return proc.returncode, parsed, int(counter.read_text())


def test_retries_watchdog_failures_until_success(tmp_path):
    rc, parsed, attempts = _run(tmp_path, fail_times=2, fail_rc=3)
    assert rc == 0
    assert parsed["value"] == 1.5
    assert attempts == 3  # 2 failures + 1 success


def test_does_not_retry_non_watchdog_failure(tmp_path):
    rc, parsed, attempts = _run(tmp_path, fail_times=1, fail_rc=1)
    assert rc == 3
    assert parsed["value"] is None
    assert attempts == 1  # an import-error-class failure won't heal


def test_exhausted_window_emits_last_error_json(tmp_path):
    rc, parsed, attempts = _run(
        tmp_path, fail_times=99, fail_rc=3, max_attempts=3
    )
    assert rc == 3
    assert parsed["value"] is None
    assert "error" in parsed
    assert attempts == 3
