"""In-process hang watchdog for tunnelled-TPU training (SURVEY §5.3).

The axon tunnel's observed failure mode is a *wedge*, not an error: the
JAX client futex-waits forever inside a dispatch (mid-run) or inside
backend init (startup).  No exception propagates, so a retry loop around
the trainer never fires — previous rounds papered over this with an
external shell watchdog that pattern-matched the trainer pid and killed
it when the log went stale (scripts/stall_watchdog.sh).  That knowledge
belongs in the framework (VERDICT r3 weak #7): the training loop itself
declares a heartbeat, and a daemon thread force-exits the process when a
device call outlives its deadline.  `os._exit` is the only reliable exit
from a futex-wedged main thread — SIGTERM handlers run *on the main
thread*, which is exactly what is stuck; checkpoint-resume (the harness
restarts from the latest stacked checkpoint) makes the exit lossless up
to checkpoint_every epochs.

Usage (what train_all.py / MultiTargetTrainer.fit do):

    wd = HangWatchdog(timeout_s=720)      # ~25 epochs of headroom
    wd.start()
    for chunk in ...:
        with wd.dispatch("epoch %d" % epoch):   # deadline armed
            run_one_epoch()                      # device-blocking call
    wd.stop()

Exit code EX_TEMPFAIL (75) tells the supervisor "transient — retry",
distinct from real failures.
"""

from __future__ import annotations

import os
import sys
import threading
import time

#: exit code used for a watchdog force-exit (BSD EX_TEMPFAIL: transient
#: failure, the caller should retry)
STALL_EXIT_CODE = 75

#: bench.py SIGSTOPs an active trainer for clean chip measurements and
#: advertises the pause through this flag file (see train/supervisor.py,
#: which re-exports it).  The watchdog's clock must not run during such
#: a pause: CLOCK_MONOTONIC keeps ticking through the T-state, so an
#: armed deadline would otherwise force-exit a healthy trainer the
#: moment it is SIGCONTed.
PAUSE_FLAG = os.environ.get("TSTM_BENCH_PAUSE_FLAG", "/tmp/tstm_bench_pause")
PAUSE_FLAG_TTL_S = 2400.0


def _pause_flag_fresh() -> bool:
    try:
        return (time.time() - os.stat(PAUSE_FLAG).st_mtime) < PAUSE_FLAG_TTL_S
    except OSError:
        return False


class HangWatchdog:
    """Force-exits the process when a device dispatch outlives its deadline.

    A single daemon thread checks every ``poll_s`` seconds whether a
    dispatch registered via :meth:`dispatch` has been in flight longer
    than ``timeout_s``.  Heartbeats are implicit: leaving the ``with``
    block clears the deadline, so a healthy loop never trips it.  The
    first dispatch (compile + device init, ~90 s after a tunnel stall)
    gets ``first_timeout_s``.
    """

    def __init__(self, timeout_s: float = 720.0,
                 first_timeout_s: float = None, poll_s: float = 15.0,
                 on_stall=None, log=None):
        self.timeout_s = float(timeout_s)
        self.first_timeout_s = float(first_timeout_s
                                     if first_timeout_s is not None
                                     else max(timeout_s, 600.0))
        self.poll_s = float(poll_s)
        self._deadline = None          # monotonic deadline or None
        self._label = ""
        self._first = True
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = None
        # test seam: default action is os._exit(75)
        self._on_stall = on_stall or self._default_stall
        self._log = log or (lambda msg: print(msg, file=sys.stderr,
                                              flush=True))

    # -- lifecycle ----------------------------------------------------------

    def start(self):
        if self._thread is not None:
            return self
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="tstm-hang-watchdog")
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2 * self.poll_s)
            self._thread = None
        # a stopped watchdog must be revivable: callers like
        # MultiTargetTrainer.fit() bracket only their own phase, and the
        # same instance then guards export/eval dispatches (start() after
        # stop() silently monitored nothing before this reset)
        self._stop = threading.Event()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- the deadline -------------------------------------------------------

    def dispatch(self, label: str = "dispatch"):
        """Context manager arming the deadline around one blocking device
        call (an epoch program, a validation sweep, a checkpoint fetch)."""
        return _Dispatch(self, label)

    def _arm(self, label: str):
        with self._lock:
            t = self.first_timeout_s if self._first else self.timeout_s
            self._deadline = time.monotonic() + t
            self._label = label

    def _disarm(self):
        with self._lock:
            self._deadline = None
            self._first = False

    # -- the thread ---------------------------------------------------------

    def _run(self):
        while not self._stop.wait(self.poll_s):
            with self._lock:
                d, label = self._deadline, self._label
            if d is not None and _pause_flag_fresh():
                # bench.py is holding the (SIGSTOPped) trainer: freeze
                # the countdown by pushing the deadline along with the
                # poll clock instead of letting it expire under a pause
                with self._lock:
                    if self._deadline is not None:
                        self._deadline += self.poll_s
                continue
            if d is not None and time.monotonic() > d:
                self._log(f"[watchdog] '{label}' exceeded its deadline — "
                          f"device wedged; exiting {STALL_EXIT_CODE} for "
                          f"a checkpoint-resume restart")
                self._on_stall()
                return

    @staticmethod
    def _default_stall():
        # flush what we can; the main thread may be unrecoverable, so
        # skip atexit/finalizers (os._exit, not sys.exit)
        try:
            sys.stdout.flush()
            sys.stderr.flush()
        except Exception:
            pass
        os._exit(STALL_EXIT_CODE)


class _Dispatch:
    def __init__(self, wd: HangWatchdog, label: str):
        self._wd = wd
        self._label = label

    def __enter__(self):
        self._wd._arm(self._label)
        return self

    def __exit__(self, *exc):
        self._wd._disarm()


def watchdog_from_env(default_timeout: float = 720.0) -> "HangWatchdog | None":
    """Build a watchdog from TSTM_WATCHDOG_S (seconds; '0' disables).
    Returns None when disabled."""
    raw = os.environ.get("TSTM_WATCHDOG_S", "")
    if raw == "0":
        return None
    try:
        timeout = float(raw) if raw else default_timeout
    except ValueError:
        timeout = default_timeout
    return HangWatchdog(timeout_s=timeout)
