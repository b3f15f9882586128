"""Subprocess entry for the multi-host tests (not collected by pytest).

Each worker is one 'host' of a fake pod: a fresh CPU process with N
virtual devices (XLA_FLAGS set by the launcher) joining a global mesh via
jax.distributed + gloo collectives. Modes:

- 'train':        one tiny iteration through the REAL train CLI.
- 'train_tp':     same, with --model-parallel 2 (data x model mesh).
- 'train_restart': two iterations with an injected per-process fault at
  iteration 2 under --auto-restart — every process's supervisor relaunches
  its worker, the pod re-rendezvouses, and training resumes from the
  iteration-1 checkpoint (replay ring included), so the result must equal
  an uninterrupted run.
- 'eval':         the trainer's gated evaluation directly (deterministic).
- 'resume_mismatch': restore from a checkpoint whose replay ring exists on
  process 0's copy but not process 1's — the cross-host consistency guard
  must raise on EVERY process.
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
    nprocs = sys.argv[5] if len(sys.argv) > 5 else "2"
    dist = [
        "--platform", "cpu",
        "--coordinator", f"127.0.0.1:{port}",
        "--num-processes", nprocs, "--process-id", pid,
    ]
    ckpt_dir = os.path.join(outdir, "ckpt")

    if mode == "train":
        from xiangqi_alphazero_tpu.train.__main__ import main as cli

        return cli([*TINY, *dist, "--checkpoint-dir", ckpt_dir])

    if mode == "train2":
        from xiangqi_alphazero_tpu.train.__main__ import main as cli

        args = list(TINY)
        args[args.index("--iterations") + 1] = "2"
        return cli([*args, *dist, "--checkpoint-dir", ckpt_dir])

    if mode == "train_tp":
        from xiangqi_alphazero_tpu.train.__main__ import main as cli

        return cli(
            [*TINY, *dist, "--model-parallel", "2",
             "--checkpoint-dir", ckpt_dir]
        )

    if mode == "train_restart":
        # Per-process fault marker: every process raises once at iteration
        # 2, its supervisor relaunches it, and the pod resumes in lockstep
        # from the iteration-1 checkpoint.
        os.environ["XQAZ_FAULT_ITER"] = f"2:{outdir}/fault_p{pid}"
        from xiangqi_alphazero_tpu.train.__main__ import main as cli

        args = list(TINY)
        args[args.index("--iterations") + 1] = "2"
        return cli(
            [*args, *dist, "--auto-restart", "2",
             "--checkpoint-dir", ckpt_dir]
        )

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

    multihost_utils.sync_global_devices(f"{mode}_worker_start")
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer

    if mode == "resume_mismatch":
        trainer = AlphaZeroTrainer(cfg)
        # each process restores its OWN copy of the same checkpoint;
        # process 1's copy is missing the .replay.npz
        path = os.path.join(outdir, f"ckpt_p{pid}", "checkpoint_iter0")
        try:
            trainer.restore(path)
        except ValueError as e:
            assert "exists on some hosts but not all" in str(e), e
            print(f"GUARD_OK p{pid}", flush=True)
            return 0
        print(f"GUARD MISSED p{pid}", flush=True)
        return 1

    assert mode == "eval"
    trainer = AlphaZeroTrainer(cfg)
    stats = trainer.evaluate()
    stats.pop("time", None)
    if trainer.is_main:
        with open(os.path.join(outdir, "eval.json"), "w") as f:
            json.dump(stats, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
