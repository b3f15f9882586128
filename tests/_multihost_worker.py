"""Subprocess entry for the multi-host tests (not collected by pytest).

Each worker is one 'host' of a fake 2-host pod: a fresh CPU process with 4
virtual devices (XLA_FLAGS set by the launcher) joining an 8-device global
mesh via jax.distributed + gloo collectives. Mode 'train' drives the REAL
train CLI (flag wiring included); mode 'eval' drives the trainer's gated
evaluation directly with identical candidate/incumbent params (a fully
deterministic parity target).
"""

import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)  # script-style execution: repo root not on path

# Tiny deterministic run shared by the workers and the in-test
# single-process reference (keep in sync by importing TINY from here).
TINY = [
    "--mode", "quick",
    "--channels", "8", "--res-blocks", "1",
    "--simulations", "4", "--games-per-iter", "8",
    "--max-game-length", "24", "--batch-size", "64", "--epochs", "1",
    "--eval-games", "4", "--eval-interval", "2",
    "--save-interval", "1", "--min-buffer", "1",
    "--iterations", "1", "--seed", "3", "--dtype", "float32",
]


def main() -> int:
    mode, pid, port, outdir = sys.argv[1:5]
    dist = [
        "--platform", "cpu",
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", "2", "--process-id", pid,
    ]
    ckpt_dir = os.path.join(outdir, "ckpt")

    if mode == "train":
        from xiangqi_alphazero_tpu.train.__main__ import main as cli

        return cli([*TINY, *dist, "--checkpoint-dir", ckpt_dir])

    assert mode == "eval"
    from xiangqi_alphazero_tpu.train.config import (
        build_argparser,
        config_from_args,
    )

    args = build_argparser().parse_args(
        [*TINY, *dist, "--checkpoint-dir", ckpt_dir]
    )
    cfg, _ = config_from_args(args)

    import jax

    jax.config.update("jax_platforms", "cpu")
    from xiangqi_alphazero_tpu.distributed import distributed_init

    distributed_init(
        coordinator_address=cfg.coordinator_address,
        num_processes=cfg.num_processes,
        process_id=cfg.process_id,
    )
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("eval_worker_start")
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer

    trainer = AlphaZeroTrainer(cfg)
    stats = trainer.evaluate()
    stats.pop("time", None)
    if trainer.is_main:
        with open(os.path.join(outdir, "eval.json"), "w") as f:
            json.dump(stats, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
