"""Multi-host bring-up — a LEAF module importing only jax.

``jax.distributed.initialize`` must run before anything touches the XLA
backend, and importing the engine/model/train modules materializes device
constants (engine.env tables). The train CLI therefore imports THIS module
only; ``parallel.sharding`` re-exports ``distributed_init`` for library
users who are already past backend init (where it is a no-op guard).
"""

from __future__ import annotations

from typing import Optional

import jax


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Controller-less SPMD bring-up: call once per host BEFORE any backend
    use. Safe no-op when already initialized. On the CPU backend (tests /
    fake pods) cross-process collectives need gloo, configured here."""
    if jax.config.jax_platforms == "cpu":
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:
        if "already" not in str(e):  # tolerate only repeat initialization
            raise
