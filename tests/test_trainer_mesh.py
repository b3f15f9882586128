"""Full trainer iteration with auto mesh sharding on the 8-device CPU mesh
(batch axes chosen divisible by 8 so mesh_mode=auto engages)."""

import jax

from xiangqi_alphazero_tpu.train import AlphaZeroTrainer, TrainingConfig


def test_trainer_auto_mesh_iteration(tmp_path):
    assert len(jax.devices()) >= 8
    cfg = TrainingConfig(
        num_channels=8,
        num_res_blocks=1,
        num_simulations=4,
        num_games_per_iter=8,     # divisible by 8 -> mesh engages
        max_game_length=10,
        temperature_threshold=4,
        random_opening_moves=1,
        enable_resign=False,
        num_iterations=1,
        batch_size=32,
        num_epochs=1,
        min_buffer_size=8,
        eval_games=8,
        eval_simulations=2,
        eval_interval=1,
        save_interval=5,
        checkpoint_dir=str(tmp_path / "ckpt"),
        dtype="float32",
        max_buffer_size=2048,
    )
    tr = AlphaZeroTrainer(cfg)
    assert tr.mesh is not None, "auto mesh should engage with 8 devices"
    stats = tr.run_iteration()
    assert stats["self_play"]["games"] == 8
    assert stats["training"]["batches"] > 0
    assert "win_rate" in stats["evaluation"]


def test_trainer_mesh_off(tmp_path):
    cfg = TrainingConfig(
        num_games_per_iter=8,
        eval_games=8,
        batch_size=32,
        mesh_mode="off",
        checkpoint_dir=str(tmp_path / "c"),
        num_channels=8,
        num_res_blocks=1,
    )
    tr = AlphaZeroTrainer(cfg)
    assert tr.mesh is None
