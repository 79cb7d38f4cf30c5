"""bench.py outage behavior: a dead device must degrade to the committed
last-known-good number (stale: true, rc 0) — BENCH_r03 shipped rc=1 when
the tunnel died mid-round (VERDICT r3 weak #1)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_stale_record_when_device_unreachable():
    env = dict(os.environ)
    env["TSTM_BENCH_PROBE_ATTEMPTS"] = "1"
    # Deterministic probe failure.  Do NOT try a bogus JAX_PLATFORMS
    # here: the axon tunnel ignores it, so the probe would find the real
    # chip and this test would run a full hardware bench (pausing any
    # live training) instead of exercising the degraded path.
    env["TSTM_BENCH_FORCE_UNREACHABLE"] = "1"
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.loads(r.stdout.strip().splitlines()[-1])
    assert rec["stale"] is True
    assert "unreachable" in rec["stale_reason"]
    assert rec["unit"] == "images/sec/chip"
    # the fallback must carry the committed last-known-good value
    with open(os.path.join(REPO, "BENCH_LAST_GOOD.json")) as f:
        good = json.load(f)
    assert rec["value"] == good["value"]
