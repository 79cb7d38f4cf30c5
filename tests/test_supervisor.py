"""In-framework run supervisor (train/supervisor.py): respawn-until-done,
attempt accounting, completion marker, and the pid-exact SIGCONT failsafe."""

import os
import signal
import subprocess
import sys
import textwrap
import time

from transformer_stm_tpu.train.supervisor import (COMPLETION_MARKER,
                                                  supervise)
from transformer_stm_tpu.train.watchdog import STALL_EXIT_CODE


def _child_script(tmp_path, body):
    path = tmp_path / "child.py"
    path.write_text(textwrap.dedent(body))
    return [sys.executable, str(path)]


def test_retries_stall_exits_until_success(tmp_path):
    """Two watchdog-style 75 exits, then success: three attempts, marker
    written, rc 0."""
    state = tmp_path / "attempts"
    log = tmp_path / "sup.log"
    cmd = _child_script(tmp_path, f"""
        import os, sys
        p = {str(state)!r}
        n = int(open(p).read()) if os.path.exists(p) else 0
        open(p, "w").write(str(n + 1))
        print("child attempt", n + 1)
        sys.exit({STALL_EXIT_CODE} if n < 2 else 0)
    """)
    rc = supervise(cmd, max_attempts=10, retry_delay_s=0.05,
                   log_path=str(log))
    assert rc == 0
    assert state.read_text() == "3"
    text = log.read_text()
    assert COMPLETION_MARKER in text
    assert text.count("supervisor attempt") == 3
    assert "watchdog stall" in text          # 75 is named, not just a code
    assert "child attempt 2" in text         # child output lands in the log


def test_gives_up_after_max_attempts(tmp_path):
    log = tmp_path / "sup.log"
    cmd = _child_script(tmp_path, "import sys; sys.exit(3)\n")
    rc = supervise(cmd, max_attempts=3, retry_delay_s=0.05,
                   log_path=str(log))
    assert rc == 3
    text = log.read_text()
    assert COMPLETION_MARKER not in text
    assert "attempts exhausted" in text
    assert text.count("supervisor attempt") == 3


def test_sigcont_failsafe_resumes_stopped_child(tmp_path):
    """A child that SIGSTOPs itself (the killed-bench scenario) is resumed
    by the supervisor's own-pid failsafe and then completes."""
    log = tmp_path / "sup.log"
    cmd = _child_script(tmp_path, """
        import os, signal
        os.kill(os.getpid(), signal.SIGSTOP)   # bench parked us and died
        print("resumed")
    """)
    t0 = time.time()
    rc = supervise(cmd, max_attempts=1, retry_delay_s=0.05,
                   log_path=str(log), cont_poll_s=0.2)
    assert rc == 0
    assert time.time() - t0 < 30
    text = log.read_text()
    assert "failsafe: SIGCONT" in text
    assert "resumed" in text


def test_pause_flag_holds_failsafe_off(tmp_path, monkeypatch):
    """While bench.py's pause flag is fresh the failsafe must NOT resume a
    stopped child (the stop is an intentional clean-measurement pause);
    deleting the flag releases it."""
    import threading

    import transformer_stm_tpu.train.watchdog as wd_mod

    flag = tmp_path / "pause_flag"
    flag.write_text("bench")
    # _pause_flag_fresh() reads watchdog.PAUSE_FLAG (supervisor merely
    # re-exports the name) — patch the module the check actually uses.
    monkeypatch.setattr(wd_mod, "PAUSE_FLAG", str(flag))

    log = tmp_path / "sup.log"
    cmd = _child_script(tmp_path, """
        import os, signal
        os.kill(os.getpid(), signal.SIGSTOP)   # bench parked us
        print("resumed")
    """)
    result = {}

    def run():
        result["rc"] = supervise(cmd, max_attempts=1, retry_delay_s=0.05,
                                 log_path=str(log), cont_poll_s=0.2)

    t = threading.Thread(target=run)
    t.start()
    time.sleep(2.0)   # ~10 failsafe polls with the flag fresh
    assert "rc" not in result, "child resumed despite a fresh pause flag"
    assert "failsafe: SIGCONT" not in log.read_text()
    flag.unlink()     # bench released (or the flag went stale)
    t.join(timeout=30)
    assert result.get("rc") == 0
    assert "resumed" in log.read_text()


def test_cli_entry(tmp_path):
    log = tmp_path / "sup.log"
    out = subprocess.run(
        [sys.executable, "-m", "transformer_stm_tpu.train.supervisor",
         "--max-attempts", "2", "--retry-delay", "0.05",
         "--log", str(log), "--",
         sys.executable, "-c", "print('ok')"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode == 0
    assert COMPLETION_MARKER in log.read_text()


def test_sigterm_terminates_child(tmp_path):
    """SIGTERM on the supervisor forwards to the child and exits."""
    marker = tmp_path / "started"
    log = tmp_path / "sup.log"
    child = _child_script(tmp_path, f"""
        import time, pathlib
        pathlib.Path({str(marker)!r}).touch()
        time.sleep(300)
    """)
    sup = subprocess.Popen(
        [sys.executable, "-m", "transformer_stm_tpu.train.supervisor",
         "--log", str(log), "--"] + child)
    # supervisor startup imports the package (and thus jax) — generous
    # budget for the loaded 1-core CI host
    for _ in range(600):
        if marker.exists():
            break
        time.sleep(0.1)
    assert marker.exists()
    sup.send_signal(signal.SIGTERM)
    assert sup.wait(timeout=30) == 128 + signal.SIGTERM
    # the child process group should wind down: give it a beat, then
    # check no orphan is still sleeping on our marker script
    time.sleep(0.5)
    children = subprocess.run(
        ["ps", "-eo", "args="], capture_output=True, text=True).stdout
    assert str(tmp_path / "child.py") not in children
