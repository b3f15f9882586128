"""--init-from warm start: params/best seeded from a best_model export,
fresh optimizer and iteration counter."""

import jax
import numpy as np

from xiangqi_alphazero_tpu.train import checkpoint as ckpt
from xiangqi_alphazero_tpu.train.config import quick_config
from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer


def test_warm_start_loads_params(tmp_path):
    cfg = quick_config()
    cfg.num_channels, cfg.num_res_blocks = 8, 1
    cfg.checkpoint_dir = str(tmp_path / "run")
    cfg.dtype = "float32"

    donor = AlphaZeroTrainer(cfg)
    # mutate donor params so they differ from a fresh init
    donor.best_params = jax.tree.map(lambda x: x + 1.0, donor.best_params)
    path = ckpt.save_best_model(
        str(tmp_path), 37, donor.best_params, donor.best_stats,
        {"num_channels": 8, "num_res_blocks": 1},
    )

    cfg2 = quick_config()
    cfg2.num_channels, cfg2.num_res_blocks = 8, 1
    cfg2.checkpoint_dir = str(tmp_path / "run2")
    cfg2.dtype = "float32"
    fresh = AlphaZeroTrainer(cfg2)
    fresh.warm_start(path)

    for a, b in zip(
        jax.tree.leaves(fresh.params), jax.tree.leaves(donor.best_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(fresh.best_params), jax.tree.leaves(donor.best_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert fresh.iteration == 0
