"""Resource monitor (reference: tools/memory.py:6-70).

The reference polls psutil + `nvidia-smi` at 1 Hz; the TPU-native
equivalent reads HBM stats from jax.local_devices() memory_stats (no
subprocess).  Run via `python -m transformer_stm_tpu.cli memory`.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional


def cpu_ram_stats() -> Dict:
    import psutil

    vm = psutil.virtual_memory()
    return {
        "cpu_percent": psutil.cpu_percent(interval=None),
        "ram_used_gb": vm.used / 2**30,
        "ram_total_gb": vm.total / 2**30,
    }


def tpu_memory_stats() -> List[Dict]:
    """Per-device HBM usage.  memory_stats() may be unsupported on some
    backends (CPU) — returns [] then."""
    import jax

    out = []
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if not stats:
            continue
        out.append({
            "device": str(d),
            "bytes_in_use_gb": stats.get("bytes_in_use", 0) / 2**30,
            "bytes_limit_gb": stats.get("bytes_limit", 0) / 2**30,
            "peak_bytes_gb": stats.get("peak_bytes_in_use", 0) / 2**30,
        })
    return out


def format_line() -> str:
    s = cpu_ram_stats()
    line = (f"CPU {s['cpu_percent']:5.1f}%  RAM "
            f"{s['ram_used_gb']:6.2f}/{s['ram_total_gb']:.1f} GB")
    for d in tpu_memory_stats():
        line += (f"  | {d['device']}: HBM {d['bytes_in_use_gb']:.2f}"
                 f"/{d['bytes_limit_gb']:.2f} GB "
                 f"(peak {d['peak_bytes_gb']:.2f})")
    return line


def monitor_loop(interval: float = 1.0, iterations: Optional[int] = None):
    """1 Hz console monitor (Ctrl-C to stop), like `make memory`."""
    n = 0
    try:
        while iterations is None or n < iterations:
            print(format_line(), flush=True)
            time.sleep(interval)
            n += 1
    except KeyboardInterrupt:
        pass
