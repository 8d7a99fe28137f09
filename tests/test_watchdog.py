"""Watchdogged subprocess runner (the tunnel-environment recovery pattern)."""

import sys

from stochquant_tpu.watchdog import run_watchdogged


def test_success_first_try():
    res = run_watchdogged(
        ["-c", "print('payload'); import sys; sys.exit(0)"],
        python=True, timeout_s=30, attempts=2, backoff_s=0,
    )
    assert res.ok
    assert res.success.index == 0
    assert "payload" in res.success.stdout


def test_retry_then_give_up_on_failure():
    seen = []
    res = run_watchdogged(
        ["-c", "import sys; sys.exit(3)"],
        python=True, timeout_s=30, attempts=2, backoff_s=0,
        on_attempt=seen.append,
    )
    assert not res.ok
    assert [a.returncode for a in res.attempts] == [3, 3]
    assert len(seen) == 2


def test_timeout_kills_and_records():
    res = run_watchdogged(
        ["-c", "import time; time.sleep(60)"],
        python=True, timeout_s=1.0, attempts=1, backoff_s=0,
    )
    assert not res.ok
    assert res.attempts[0].timed_out
    assert res.attempts[0].elapsed_s < 30


def test_recovers_after_transient_failure(tmp_path):
    marker = tmp_path / "marker"
    code = (
        "import os, sys\n"
        f"p = {str(marker)!r}\n"
        "if os.path.exists(p):\n"
        "    print('second try ok')\n"
        "    sys.exit(0)\n"
        "open(p, 'w').close()\n"
        "sys.exit(1)\n"
    )
    res = run_watchdogged(
        ["-c", code], python=True, timeout_s=30, attempts=3, backoff_s=0
    )
    assert res.ok
    assert res.success.index == 1
    assert "second try ok" in res.success.stdout
