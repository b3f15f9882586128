"""Orbax checkpointing: full training state + slim best-model exports.

Reference parity (training/train.py:537-579): the full checkpoint carries
iteration, current and best model states, optimizer state and topology
config; a separate slim 'best_model' is written for serving/export
consumers. Resume restores everything and continues the iteration counter.
Beyond the reference: the trainer also saves the replay ring next to each
checkpoint (checkpoint_iterN.replay.npz, plain npz — the reference never
saves its deque, and a cold-buffer resume measurably stalls continuation
training, see models/README.md). Disable with checkpoint_replay=0 for
reference behavior.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt_dir: str, iteration: int, payload: Dict[str, Any]) -> str:
    """Multi-host: EVERY process must call this (orbax coordinates via
    jax.distributed barriers — the primary writes the replicated/host data,
    the others participate in the sync)."""
    path = os.path.abspath(os.path.join(ckpt_dir, f"checkpoint_iter{iteration}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, _to_host(payload), force=True)
    return path


def save_best_model(
    ckpt_dir: str, iteration: int, params, batch_stats, model_config: Dict
) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, "best_model"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "params": _to_host(params),
                "batch_stats": _to_host(batch_stats),
                "iteration": iteration,
            },
            force=True,
        )
    if jax.process_index() == 0:  # plain file: one writer
        with open(os.path.join(ckpt_dir, "best_model_config.json"), "w") as f:
            json.dump(model_config, f)
    return path


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    with ocp.PyTreeCheckpointer() as ckptr:
        if target is not None:
            return ckptr.restore(os.path.abspath(path), item=_to_host(target))
        return ckptr.restore(os.path.abspath(path))


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_iter = None, -1
    for name in os.listdir(ckpt_dir):
        if name.startswith("checkpoint_iter"):
            try:
                it = int(name.removeprefix("checkpoint_iter"))
            except ValueError:
                continue
            if it > best_iter:
                best, best_iter = os.path.join(ckpt_dir, name), it
    return best
