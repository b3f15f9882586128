"""Persistent XLA compilation cache for the CLI entry points.

First compiles of the big fused programs cost minutes (the self-play
segment at production sizes, the serve search at 500 sims); the persistent
cache brings repeat startups of plain XLA programs down to seconds
(measured 353s -> 10s through the tunneled-TPU remote-compile path;
programs containing Pallas custom calls may still recompile on this
infrastructure). Enabled by the train / serve CLIs and bench.py — library
imports never touch global jax config.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    import jax

    cache_dir = path or os.environ.get(
        "XAZ_XLA_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "xiangqi_az_tpu", "xla"
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return cache_dir
