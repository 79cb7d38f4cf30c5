"""Test env: force CPU backend with 8 virtual devices so DP/TP collective
tests run without TPU hardware (SURVEY.md §4), and enable x64-free
deterministic configs.  Must run before jax is imported anywhere."""

import os
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Isolate the bench<->supervisor pause-flag handshake from the REAL
# /tmp/tstm_bench_pause: a live bench on this host must never freeze
# watchdogs/failsafes inside the test suite (and vice versa).  Set before
# the package import below so watchdog.PAUSE_FLAG picks it up, and
# inherited by every subprocess the tests spawn.
os.environ.setdefault(
    "TSTM_BENCH_PAUSE_FLAG",
    os.path.join(tempfile.mkdtemp(prefix="tstm_test_pause_"), "flag"))
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Keep TF quiet and CPU-only for the parity tests.
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
# Parity tests run against legacy Keras 2 (tf_keras) — the API generation
# the reference was written for; Keras 3 rejects its tf.shape-on-
# KerasTensor idioms (tests/test_reference_parity.py).
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag is
# honored. Must run before any computation creates a backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
