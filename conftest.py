"""Pytest bootstrap: force an 8-device virtual CPU platform for all tests.

Mirrors the reference's "CPU as fake GPU" multi-process test pattern
(reference: training/test_gpu_train.py:25) with the JAX-native equivalent:
XLA host-platform device-count spoofing, so sharding/pjit paths are exercised
without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize imports jax at interpreter startup pointed
at a tunneled TPU, so env vars alone are too late — we must override via
jax.config before any backend initializes.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# NOTE: deliberately NO persistent XLA compilation cache here. It was
# tried (3x faster on compile-bound modules) but XLA:CPU AOT cache loads
# warn about machine-feature mismatches ("could lead to execution errors
# such as SIGILL") on this host, and suite wall-clock is dominated by
# execution anyway (47 -> 43 min). Tests stay hermetic; the CLI entry
# points keep their cache (utils/cache.py).
