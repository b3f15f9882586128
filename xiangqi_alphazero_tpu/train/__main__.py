"""CLI entry: python -m xiangqi_alphazero_tpu.train --mode quick|standard|full|tpu

Mirrors the reference CLI (training/train.py:707-764)."""

import logging
import os
import sys

from .config import build_argparser, config_from_args
from .trainer import AlphaZeroTrainer


def main(argv=None) -> int:
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_argparser().parse_args(argv)
    cfg, resume = config_from_args(args)
    os.makedirs(cfg.checkpoint_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(levelname)s] %(message)s",
        handlers=[
            logging.StreamHandler(),
            logging.FileHandler(os.path.join(cfg.checkpoint_dir, "training.log")),
        ],
        # jax configures root logging at import; without force the config
        # above is silently ignored
        force=True,
    )
    trainer = AlphaZeroTrainer(cfg)
    trainer.train(resume=resume)
    return 0


if __name__ == "__main__":
    sys.exit(main())
