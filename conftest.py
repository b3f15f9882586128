"""Pytest bootstrap: force an 8-device virtual CPU platform BEFORE jax import.

Mirrors the reference's "CPU as fake GPU" multi-process test pattern
(reference: training/test_gpu_train.py:25) with the JAX-native equivalent:
XLA host-platform device-count spoofing, so sharding/pjit paths are exercised
without TPU hardware (SURVEY.md §4).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
