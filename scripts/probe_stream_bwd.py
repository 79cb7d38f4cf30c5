"""A/B the fully-streaming flash-attention backward at the 512px config.

The 512px CvT stretch config (16,384 stage-1 tokens, BASELINE config 5)
previously trained its attention backward through the einsum-scan XLA
fallback (committed Result/highres_bench_512.json: 48.8 train img/s).
kernels/flash_attention.py now dispatches that regime to the fully-
streaming Pallas pair (both sequence sides blocked, grid-accumulated
output tiles).  This probe re-runs scripts/bench_highres.py 512 under the
new default dispatch in a subprocess (Mosaic faults stay contained) and
records old-vs-new train throughput.

Safe to run against an active trainer: it borrows bench.py's
_pause_competing_training (SIGSTOP + pause-flag handshake + settle).

Usage: python scripts/probe_stream_bwd.py [size] [batch]
Writes Result/stream_bwd_probe.json (and bench_highres refreshes
Result/highres_bench_{size}.json as its side effect).
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

import bench  # repo-root bench.py: reuse the trainer pause handshake


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "512"
    batch = sys.argv[2] if len(sys.argv) > 2 else "8"
    committed = {}
    path = f"Result/highres_bench_{size}.json"
    if os.path.exists(path):
        with open(path) as f:
            committed = json.load(f)

    bench._pause_competing_training()

    env = dict(os.environ, TSTM_FLASH_BWD="auto")
    proc = subprocess.run(
        [sys.executable, "scripts/bench_highres.py", size, batch],
        capture_output=True, text=True, timeout=1800, env=env)
    print(proc.stdout)
    if proc.returncode != 0:
        print(proc.stderr[-2000:], file=sys.stderr)
        print(json.dumps({"error": f"bench_highres rc={proc.returncode}"}))
        return 1
    new = json.loads(proc.stdout.strip().splitlines()[-1])

    out = {
        "size": int(size), "batch": int(batch),
        "train_img_per_s_xla_scan_bwd": committed.get("train_img_per_s"),
        "train_img_per_s_stream_bwd": new["train_img_per_s"],
        "forward_img_per_s": new["forward_img_per_s"],
        "speedup": (round(new["train_img_per_s"]
                          / committed["train_img_per_s"], 3)
                    if committed.get("train_img_per_s") else None),
    }
    with open("Result/stream_bwd_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
