"""HangWatchdog (train/watchdog.py): in-framework stall detection.

The tunnelled TPU wedges silently (futex-wait) instead of raising —
SURVEY §5.3's failure-detection subsystem must catch that from inside
the process (VERDICT r3 weak #7: this used to be an external shell
script's job)."""

import os
import subprocess
import sys
import time

from transformer_stm_tpu.train.watchdog import (HangWatchdog,
                                                STALL_EXIT_CODE,
                                                watchdog_from_env)


def test_healthy_dispatches_never_trip():
    trips = []
    wd = HangWatchdog(timeout_s=0.5, first_timeout_s=0.5, poll_s=0.05,
                      on_stall=lambda: trips.append(1))
    with wd:
        for i in range(4):
            with wd.dispatch(f"step {i}"):
                time.sleep(0.05)
    assert not trips


def test_wedged_dispatch_trips():
    trips = []
    wd = HangWatchdog(timeout_s=0.2, first_timeout_s=0.2, poll_s=0.05,
                      on_stall=lambda: trips.append(1))
    with wd:
        with wd.dispatch("wedged"):
            time.sleep(0.6)   # outlives the deadline
    assert trips


def test_first_dispatch_gets_longer_deadline():
    trips = []
    wd = HangWatchdog(timeout_s=0.1, first_timeout_s=0.6, poll_s=0.05,
                      on_stall=lambda: trips.append(1))
    with wd:
        with wd.dispatch("first (compile + device init)"):
            time.sleep(0.3)   # > timeout_s but < first_timeout_s
        assert not trips
        with wd.dispatch("second"):
            time.sleep(0.3)   # now past the steady-state deadline
    assert trips


def test_no_deadline_between_dispatches():
    trips = []
    wd = HangWatchdog(timeout_s=0.1, first_timeout_s=0.1, poll_s=0.05,
                      on_stall=lambda: trips.append(1))
    with wd:
        with wd.dispatch("quick"):
            pass
        time.sleep(0.4)   # idle host-side work may take arbitrarily long
    assert not trips


def test_env_factory():
    os.environ["TSTM_WATCHDOG_S"] = "0"
    try:
        assert watchdog_from_env() is None
    finally:
        os.environ["TSTM_WATCHDOG_S"] = "123"
    try:
        wd = watchdog_from_env()
        assert wd is not None and wd.timeout_s == 123.0
    finally:
        del os.environ["TSTM_WATCHDOG_S"]
    assert watchdog_from_env(default_timeout=55).timeout_s == 55.0


def test_default_action_force_exits_process():
    """The real stall action must end a process whose main thread is
    blocked — run one and check the exit code."""
    src = (
        "import time\n"
        "from transformer_stm_tpu.train.watchdog import HangWatchdog\n"
        "wd = HangWatchdog(timeout_s=0.2, first_timeout_s=0.2,"
        " poll_s=0.05).start()\n"
        "with wd.dispatch('wedged'):\n"
        "    time.sleep(30)\n"
    )
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", src], timeout=20,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == STALL_EXIT_CODE
    assert time.time() - t0 < 10   # exited on the deadline, not the sleep


def test_multi_trainer_fit_accepts_watchdog():
    """fit(watchdog=...) arms the deadline around device dispatches; a
    healthy tiny run completes without tripping."""
    from transformer_stm_tpu.train.multi import MultiTargetTrainer
    from test_multi import _cfg

    trips = []
    wd = HangWatchdog(timeout_s=300, first_timeout_s=300, poll_s=0.1,
                      on_stall=lambda: trips.append(1))

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        cfg = _cfg(Path(td))
        tr = MultiTargetTrainer(cfg, [("50HZ_Bm", 0, None)], impl="xla",
                                mlp_impl="xla")
        tr.fit(1, verbose=False, watchdog=wd)
    assert tr.epoch == 1
    assert not trips


def test_stop_is_revivable():
    """MultiTargetTrainer.fit used to stop() the caller's watchdog; a
    later start() must actually monitor again (the _stop event is reset),
    so export/eval dispatches after training stay guarded."""
    trips = []
    wd = HangWatchdog(timeout_s=0.2, first_timeout_s=0.2, poll_s=0.05,
                      on_stall=lambda: trips.append(1))
    wd.start()
    wd.stop()
    wd.start()
    with wd.dispatch("post-restart wedge"):
        time.sleep(0.6)
    wd.stop()
    assert trips


def test_fresh_pause_flag_freezes_countdown(tmp_path, monkeypatch):
    """While bench.py's pause flag is fresh the deadline must not expire
    (the trainer is SIGSTOPped, not wedged); once the flag is gone the
    countdown resumes."""
    import transformer_stm_tpu.train.watchdog as wd_mod

    flag = tmp_path / "pause"
    flag.write_text("bench")
    monkeypatch.setattr(wd_mod, "PAUSE_FLAG", str(flag))

    trips = []
    wd = HangWatchdog(timeout_s=0.2, first_timeout_s=0.2, poll_s=0.05,
                      on_stall=lambda: trips.append(1))
    with wd:
        with wd.dispatch("paused, not wedged"):
            time.sleep(0.6)       # far past the deadline, flag fresh
            assert not trips
            flag.unlink()         # bench released
            time.sleep(0.5)       # countdown resumes and expires
    assert trips
