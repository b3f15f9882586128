"""Training configuration: one dataclass tree + presets + CLI overrides.

Field-for-field parity with the reference config (reference:
training/train.py:55-111) plus TPU-specific knobs (batch of concurrent
self-play games, compute dtype, mesh axes). Presets quick/standard/full
mirror reference train.py:645-704.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass
class TrainingConfig:
    # model
    num_channels: int = 128
    num_res_blocks: int = 6

    # MCTS
    num_simulations: int = 200
    c_puct: float = 1.5
    temperature_threshold: int = 20  # plies at temp 1.0, then 0.3
    temperature_schedule: str = "binary"  # selects the reference game loop
    #   replicated as a whole: "binary" = parallel workers (1.0 then 0.3 by
    #   total move count, adjudication at the cap, resign after 10 recorded
    #   moves) | "anneal" = serial loop (linear 1.0 -> 0.1 over the 10
    #   recorded steps past the threshold, draw at the cap, resign after
    #   step 40). See SelfPlaySettings.temperature_schedule.
    max_children: int = 128
    search_algo: str = "puct"  # "puct" = reference loop semantics exactly;
    #   "gumbel" = sequential-halving root search (search/gumbel.py, beyond
    #   the reference): acts the halving winner, trains on the improved
    #   policy; strong at 16-64 sims/move, so iterations cost a fraction of
    #   PUCT at reference depths. Gated eval stays PUCT either way (a fair
    #   fixed arena between candidate and best).
    max_considered: int = 16   # gumbel root candidates (m)
    # playout-cap randomization (KataGo arXiv:1902.10565 §3.1, beyond the
    # reference): prob of a FULL search per self-play ply (1.0 = off);
    # other plies run playout_cap_sims cheap searches recording value-only
    # samples. E.g. --playout-cap-prob 0.25 --playout-cap-sims 32 cuts
    # self-play search cost ~3x at standard depth.
    playout_cap_prob: float = 1.0
    playout_cap_sims: int = 0
    # per-(game,move) coins (KataGo's exact semantics) instead of one coin
    # per lockstep ply; fidelity lever, not a compute saving — see
    # train/selfplay.py SelfPlaySettings
    playout_cap_per_game: bool = False

    # self-play
    num_games_per_iter: int = 20     # == the self-play batch (games in lockstep)
    max_game_length: int = 300
    resign_threshold: float = -0.9
    resign_check_steps: int = 5
    enable_resign: bool = True
    random_opening_moves: int = 4

    # training
    num_iterations: int = 100
    batch_size: int = 256
    num_epochs: int = 5
    learning_rate: float = 2e-3
    weight_decay: float = 1e-4
    lr_milestones: Tuple[int, ...] = (50, 80)
    lr_gamma: float = 0.1

    # data
    max_buffer_size: int = 50_000
    min_buffer_size: int = 500
    # max train-scan batches per device program (0 = all of the iteration's
    # epochs as ONE scan). The tunneled-TPU watchdog kills device programs
    # at ~60 s (docs/PERF_NOTES.md); at 256ch/10res a full-buffer scan
    # exceeds that, so large nets set this to bound each program while the
    # (params, opt_state) carry chains across segments — math identical to
    # the single scan
    train_segment_batches: int = 0

    # evaluation (gating)
    eval_games: int = 10
    eval_win_rate: float = 0.55
    eval_simulations: int = 100
    eval_interval: int = 2           # evaluate every N iterations

    # checkpointing
    checkpoint_dir: str = "checkpoints"
    save_interval: int = 5
    checkpoint_replay: bool = True   # also save the replay ring next to each
    #   checkpoint (checkpoint_iterN.replay.npz) so --resume continues from
    #   the exact buffer, not a cold one (the reference never saves its
    #   deque; a cold-buffer resume measurably stalls continuation training
    #   — see models/README.md)

    # TPU execution
    dtype: str = "bfloat16"          # network compute dtype
    mesh_axis: str = "data"          # self-play + learner data-parallel axis
    mesh_mode: str = "auto"          # "auto": shard over all global devices
    #   (batch axes padded up to device-count divisibility); "off":
    #   single-device jit
    model_parallel: int = 1          # >1: 2-D ('data','model') mesh with the
    #   head Dense layers (policy FC = ~80% of params) Megatron-sharded over
    #   'model'; learner params + Adam moments live in that layout, actors
    #   stay replicated. Works single- and multi-process (the 'data' axis
    #   spans hosts; parallel/sharding.tp_place assembles the global arrays)
    seed: int = 0

    # multi-host (controller-less SPMD over DCN; every host runs this same
    # CLI with its own --process-id — replaces the reference's process-pool
    # + Unix-socket IPC layer, reference: training/inference_server.py)
    coordinator_address: Optional[str] = None  # "host:port" of process 0
    num_processes: int = 1
    process_id: int = 0

    def lr_at(self, iteration: int) -> float:
        """MultiStepLR semantics (reference: train.py:196-200, stepped once
        per iteration at train.py:433)."""
        lr = self.learning_rate
        for m in self.lr_milestones:
            if iteration >= m:
                lr *= self.lr_gamma
        return lr


def quick_config() -> TrainingConfig:
    """Fast smoke/demo settings (reference: train.py:645-674)."""
    return TrainingConfig(
        num_channels=64,
        num_res_blocks=3,
        num_simulations=80,
        num_games_per_iter=6,
        num_iterations=10,
        batch_size=64,
        num_epochs=5,
        min_buffer_size=100,
        eval_games=4,
        eval_simulations=40,
        save_interval=2,
        temperature_threshold=15,
        max_game_length=200,
        learning_rate=2e-3,
        random_opening_moves=4,
        enable_resign=True,
        resign_threshold=-0.85,
        resign_check_steps=3,
    )


def standard_config() -> TrainingConfig:
    """Reference: train.py:677-689."""
    return TrainingConfig(
        num_channels=128,
        num_res_blocks=6,
        num_simulations=200,
        num_games_per_iter=20,
        num_iterations=50,
        max_game_length=300,
        random_opening_moves=6,
        enable_resign=True,
    )


def full_config() -> TrainingConfig:
    """Reference: train.py:692-704."""
    return TrainingConfig(
        num_channels=256,
        num_res_blocks=10,
        num_simulations=400,
        num_games_per_iter=50,
        num_iterations=200,
        max_game_length=400,
        random_opening_moves=8,
        enable_resign=True,
    )


def tpu_config() -> TrainingConfig:
    """TPU-scale production preset (no reference analogue): the standard
    network, but with the self-play fleet sized for the chip rather than for
    a CPU process pool — ~1000x the reference's game throughput per
    iteration at the same per-move search budget."""
    return TrainingConfig(
        num_channels=128,
        num_res_blocks=6,
        num_simulations=200,
        num_games_per_iter=512,
        num_iterations=50,
        batch_size=1024,
        max_game_length=300,
        random_opening_moves=6,
        enable_resign=True,
        max_buffer_size=500_000,
        min_buffer_size=10_000,
        eval_games=64,
        eval_simulations=100,
    )


PRESETS = {
    "quick": quick_config,
    "standard": standard_config,
    "full": full_config,
    "tpu": tpu_config,
}


def build_argparser() -> argparse.ArgumentParser:
    """CLI mirroring the reference's flags (reference: train.py:707-754)."""
    p = argparse.ArgumentParser(description="Xiangqi AlphaZero TPU training")
    p.add_argument("--mode", choices=sorted(PRESETS), default="quick")
    p.add_argument("--iterations", type=int)
    p.add_argument("--games-per-iter", type=int)
    p.add_argument("--simulations", type=int)
    p.add_argument("--channels", type=int)
    p.add_argument("--res-blocks", type=int)
    p.add_argument("--resume", type=str)
    p.add_argument("--init-from", type=str,
                   help="warm-start params from a best_model export "
                        "(fresh optimizer/iteration counter)")
    p.add_argument("--checkpoint-dir", type=str)
    p.add_argument("--seed", type=int)
    p.add_argument("--dtype", choices=["float32", "bfloat16"])
    p.add_argument("--max-game-length", type=int)
    p.add_argument("--batch-size", type=int)
    p.add_argument("--eval-games", type=int)
    p.add_argument("--eval-interval", type=int)
    p.add_argument("--save-interval", type=int)
    p.add_argument("--auto-restart", type=int, default=0, metavar="N",
                   help="supervise the run: on failure (dead device "
                        "backend, dropped tunnel) relaunch a fresh "
                        "process from the latest checkpoint, up to N "
                        "times (full-fidelity checkpoints make the "
                        "restart bit-identical)")
    p.add_argument("--checkpoint-replay", type=int, choices=[0, 1],
                   help="1 (default): save/restore the replay ring with "
                        "each checkpoint; 0: reference behavior (cold "
                        "buffer on resume)")
    p.add_argument("--min-buffer", type=int)
    p.add_argument("--max-buffer", type=int,
                   help="replay ring capacity (samples)")
    p.add_argument("--train-segment", type=int,
                   help="max train batches per device program (0 = one "
                        "fused scan; set for big nets to stay under the "
                        "device watchdog)")
    p.add_argument("--epochs", type=int)
    p.add_argument("--temp-schedule", choices=["binary", "anneal"])
    p.add_argument("--search-algo", choices=["puct", "gumbel"],
                   help="self-play search: puct (reference semantics, "
                        "default) or gumbel (sequential-halving root — "
                        "pair with a small --simulations)")
    p.add_argument("--max-considered", type=int,
                   help="gumbel root candidate count m (default 16)")
    p.add_argument("--playout-cap-prob", type=float,
                   help="probability of a FULL search per self-play ply "
                        "(default 1.0 = off); other plies use "
                        "--playout-cap-sims and record value-only samples")
    p.add_argument("--playout-cap-per-game", type=int, choices=[0, 1],
                   help="1: independent playout-cap coin per (game, move) "
                        "(KataGo semantics; puct only, full-search "
                        "compute); 0 (default): one coin per ply")
    p.add_argument("--playout-cap-sims", type=int,
                   help="cheap-search budget for capped plies")
    p.add_argument("--mesh-mode", choices=["auto", "off"])
    p.add_argument("--model-parallel", type=int,
                   help="shard the head Dense layers over this many devices "
                        "(2-D data x model mesh)")
    # multi-host bring-up (jax.distributed): run the same command on every
    # host with its own --process-id
    p.add_argument("--coordinator", type=str,
                   help="host:port of process 0's coordinator service")
    p.add_argument("--num-processes", type=int)
    p.add_argument("--process-id", type=int)
    p.add_argument("--platform", type=str,
                   help="force a jax platform (e.g. cpu) before backend init")
    return p


def config_from_args(args: argparse.Namespace) -> Tuple[TrainingConfig, Optional[str]]:
    cfg = PRESETS[args.mode]()
    overrides = {
        "iterations": "num_iterations",
        "games_per_iter": "num_games_per_iter",
        "simulations": "num_simulations",
        "channels": "num_channels",
        "res_blocks": "num_res_blocks",
        "checkpoint_dir": "checkpoint_dir",
        "seed": "seed",
        "dtype": "dtype",
        "max_game_length": "max_game_length",
        "batch_size": "batch_size",
        "eval_games": "eval_games",
        "eval_interval": "eval_interval",
        "save_interval": "save_interval",
        "checkpoint_replay": "checkpoint_replay",
        "min_buffer": "min_buffer_size",
        "max_buffer": "max_buffer_size",
        "train_segment": "train_segment_batches",
        "epochs": "num_epochs",
        "temp_schedule": "temperature_schedule",
        "search_algo": "search_algo",
        "max_considered": "max_considered",
        "playout_cap_prob": "playout_cap_prob",
        "playout_cap_sims": "playout_cap_sims",
        "playout_cap_per_game": "playout_cap_per_game",
        "mesh_mode": "mesh_mode",
        "model_parallel": "model_parallel",
        "coordinator": "coordinator_address",
        "num_processes": "num_processes",
        "process_id": "process_id",
    }
    for arg_name, field in overrides.items():
        v = getattr(args, arg_name, None)
        if v is not None:
            setattr(cfg, field, v)
    cfg.checkpoint_replay = bool(cfg.checkpoint_replay)
    return cfg, args.resume
