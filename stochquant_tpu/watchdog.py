"""Watchdogged subprocess execution for flaky accelerator environments.

The TPU-tunnel PJRT backend used in this environment can wedge indefinitely
inside a remote compile or a device readback — no exception, no timeout, the
process just hangs.  The only robust recovery is process-level: run the
device-touching work in a child process under a wall-clock watchdog and
retry on timeout/crash.  ``bench.py`` pioneered the pattern; this module is
the reusable form (ROADMAP "robustness" item: structured error surfaces for
the tunnel environment).

The reference has no analog — its failure story is numerical only
(``tauhost.c:533-544``); this is part of the hardware-fault half the TPU
build adds (SURVEY.md §5 "failure detection"), alongside
``runtime.PreemptionGuard``.
"""

from __future__ import annotations

import dataclasses
import subprocess
import sys
import time
from typing import Callable, Optional, Sequence

__all__ = ["Attempt", "WatchdogResult", "run_watchdogged"]


@dataclasses.dataclass
class Attempt:
    """One child-process attempt."""

    index: int
    returncode: Optional[int]  # None = killed by the watchdog timeout
    elapsed_s: float
    stdout: str
    stderr: str

    @property
    def timed_out(self) -> bool:
        return self.returncode is None

    @property
    def ok(self) -> bool:
        return self.returncode == 0


@dataclasses.dataclass
class WatchdogResult:
    """Outcome of :func:`run_watchdogged`: the attempt log plus the first
    successful attempt (or None if every attempt failed)."""

    attempts: list
    success: Optional[Attempt]

    @property
    def ok(self) -> bool:
        return self.success is not None


def run_watchdogged(
    argv: Sequence[str],
    *,
    timeout_s: float = 1500.0,
    attempts: int = 3,
    backoff_s: float = 90.0,
    python: bool = False,
    on_attempt: Optional[Callable[[Attempt], None]] = None,
) -> WatchdogResult:
    """Run ``argv`` in a child process under a wall-clock watchdog, retrying
    on timeout or non-zero exit.

    argv: the command; with ``python=True`` it is prefixed with
      ``sys.executable`` (the common "re-run this script as a worker" case).
    timeout_s: watchdog per attempt — on expiry the child is killed
      (``subprocess.run``'s timeout kills the direct child; workers must not
      daemonize grandchildren).
    attempts: total tries before giving up.
    backoff_s: sleep between attempts (lets a wedged tunnel session expire).
    on_attempt: optional callback invoked with each finished
      :class:`Attempt` (e.g. for logging).

    Returns a :class:`WatchdogResult`; ``result.success.stdout`` carries the
    worker's output on success.  Never raises on worker failure — inspect
    ``result.ok``.
    """
    cmd = ([sys.executable] if python else []) + list(argv)
    log: list = []
    for i in range(attempts):
        t0 = time.time()
        try:
            out = subprocess.run(
                cmd,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                timeout=timeout_s,
            )
            att = Attempt(
                index=i,
                returncode=out.returncode,
                elapsed_s=time.time() - t0,
                stdout=out.stdout.decode(errors="replace"),
                stderr=out.stderr.decode(errors="replace"),
            )
        except subprocess.TimeoutExpired as e:
            att = Attempt(
                index=i,
                returncode=None,
                elapsed_s=time.time() - t0,
                stdout=(e.stdout or b"").decode(errors="replace"),
                stderr=(e.stderr or b"").decode(errors="replace"),
            )
        log.append(att)
        if on_attempt is not None:
            on_attempt(att)
        if att.ok:
            return WatchdogResult(attempts=log, success=att)
        if i + 1 < attempts:
            time.sleep(backoff_s)
    return WatchdogResult(attempts=log, success=None)
