"""Tensor parallelism: Megatron-sharded head Dense layers on a 2-D
('data','model') mesh (no reference analogue — the reference is strictly
single-device training, reference: training/train.py:403-419; SURVEY §2.2
lists TP as absent upstream, first-class here).

Checks, on the 8-device CPU mesh:
- placement: policy FC column-sharded, value output FC row-sharded, Adam
  moments inheriting the layout;
- numerics: TP forward and TP train-step losses match the single-device
  learner (the collectives GSPMD inserts are mathematically transparent);
- persistence: the TP layout survives the train-epochs scan;
- trainer wiring: model_parallel=2 builds the (4,2) mesh and runs a full
  iteration (self-play -> train -> gated eval) with TP learner params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiangqi_alphazero_tpu.models import init_net
from xiangqi_alphazero_tpu.parallel import (
    batch_sharded,
    make_tp_mesh,
    make_tp_train_step,
    tp_place,
)
from xiangqi_alphazero_tpu.train.learner import (
    make_optimizer,
    make_train_epochs,
    set_learning_rate,
    train_step,
)


@pytest.fixture(scope="module")
def tp_mesh():
    assert len(jax.devices()) >= 8
    return make_tp_mesh(2)  # (4, 2) data x model


@pytest.fixture()
def small_net():
    # function-scoped: device_put in tp_place may alias the source buffer as
    # the device-0 shard, and several tests donate the placed tree
    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    return net, variables["params"], variables["batch_stats"]


def _batch(b: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    boards = np.zeros((b, 90), np.int8)
    boards[:, :16] = rng.integers(-7, 8, (b, 16), dtype=np.int8)
    return (
        boards,
        np.ones(b, np.int8),
        rng.integers(0, 8100, (b, 8), dtype=np.int32),
        np.full((b, 8), 1.0 / 8, np.float32),
        np.zeros(b, np.float32),
        np.ones(b, np.float32),
    )


def test_tp_validation_errors(tmp_path):
    # 8 does not divide the value-head width 128? it does — but not 8100:
    # only divisors of gcd(8100, 128) = 4 are accepted
    with pytest.raises(ValueError, match="must divide"):
        make_tp_mesh(8)
    with pytest.raises(ValueError, match="must divide"):
        make_tp_mesh(3)  # divides 8100 but not 128

    # asking for TP without a mesh must fail loudly, not silently ignore
    from xiangqi_alphazero_tpu.train import AlphaZeroTrainer, TrainingConfig

    cfg = TrainingConfig(
        num_channels=8, num_res_blocks=1, mesh_mode="off",
        model_parallel=2, checkpoint_dir=str(tmp_path / "c"),
    )
    with pytest.raises(ValueError, match="model_parallel"):
        AlphaZeroTrainer(cfg)


def test_tp_placement_and_moments(tp_mesh, small_net):
    net, params, _ = small_net
    placed = tp_place(tp_mesh, params)
    k = placed["Dense_0"]["kernel"]
    assert tuple(k.sharding.spec) == (None, "model")
    assert len(k.addressable_shards) == 8
    # each model-shard holds half the 8100 output features
    assert k.addressable_shards[0].data.shape == (k.shape[0], k.shape[1] // 2)
    assert tuple(placed["Dense_2"]["kernel"].sharding.spec) == ("model", None)
    assert tuple(placed["Dense_1"]["bias"].sharding.spec) == ("model",)
    # conv tower replicated
    assert placed["Conv_0"]["kernel"].sharding.spec == jax.sharding.PartitionSpec()

    tx = make_optimizer(1e-3, 1e-4)
    opt = tx.init(placed)
    mu = opt.inner_state[2].mu["Dense_0"]["kernel"]
    assert tuple(mu.sharding.spec) == (None, "model")


def test_tp_forward_matches_replicated(tp_mesh, small_net):
    net, params, stats = small_net
    placed = tp_place(tp_mesh, params)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, 10, 9, 15)).astype(np.float32)
    )

    def fwd(p, x):
        return net.apply({"params": p, "batch_stats": stats}, x, train=False)

    ref_logits, ref_value = jax.jit(fwd)(params, x)
    tp_logits, tp_value = jax.jit(fwd)(placed, x)
    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(tp_value), np.asarray(ref_value), atol=1e-5, rtol=1e-4
    )


def test_tp_train_step_matches_single_device(tp_mesh, small_net):
    net, params, stats = small_net
    tx = make_optimizer(1e-3, 1e-4)
    batch = _batch(16)

    opt1 = set_learning_rate(tx.init(params), 1e-3)
    _, _, _, m1 = train_step(
        net, tx, jax.tree.map(jnp.copy, params), stats, opt1, *batch
    )

    placed = tp_place(tp_mesh, params)
    opt2 = set_learning_rate(tx.init(placed), 1e-3)
    step = make_tp_train_step(net, tx, tp_mesh)
    p2, _, o2, m2 = step(placed, stats, opt2, *batch)

    # losses (pre-update forward) must agree to float noise; post-Adam params
    # are NOT compared — Adam's first-step update is sign(g)*lr, which flips
    # on near-zero gradients under any reduction reorder
    assert abs(float(m1.total_loss) - float(m2.total_loss)) < 1e-4
    assert abs(float(m1.policy_loss) - float(m2.policy_loss)) < 1e-4
    # layout preserved through the step, moments included
    assert tuple(p2["Dense_0"]["kernel"].sharding.spec) == (None, "model")
    assert tuple(
        o2.inner_state[2].nu["Dense_0"]["kernel"].sharding.spec
    ) == (None, "model")


def test_tp_layout_survives_train_epochs_scan(tp_mesh, small_net):
    net, params, stats = small_net
    tx = make_optimizer(1e-3, 1e-4)
    placed = tp_place(tp_mesh, params)
    opt = set_learning_rate(tx.init(placed), 1e-3)

    N, b, S = 64, 16, 3
    rng = np.random.default_rng(0)
    boards = np.zeros((N, 90), np.int8)
    boards[:, :16] = rng.integers(-7, 8, (N, 16), dtype=np.int8)
    bufs = (
        jnp.asarray(boards),
        jnp.ones(N, jnp.int8),
        jnp.asarray(rng.integers(0, 8100, (N, 8), dtype=np.int32)),
        jnp.full((N, 8), 1.0 / 8, jnp.float32),
        jnp.zeros(N, jnp.float32),
    )
    perm = jnp.asarray(rng.integers(0, N, (S, b), dtype=np.int32))
    wmask = jnp.ones((S, b), jnp.float32)
    run = make_train_epochs(net, tx, batch_sharded(tp_mesh))
    p2, _, o2, losses = run(placed, stats, opt, *bufs, perm, wmask)
    assert tuple(p2["Dense_0"]["kernel"].sharding.spec) == (None, "model")
    assert tuple(
        o2.inner_state[2].mu["Dense_0"]["kernel"].sharding.spec
    ) == (None, "model")
    assert np.all(np.isfinite(np.asarray(losses)))


def test_trainer_model_parallel_iteration(tmp_path):
    from xiangqi_alphazero_tpu.train import AlphaZeroTrainer, TrainingConfig

    cfg = TrainingConfig(
        num_channels=8,
        num_res_blocks=1,
        num_simulations=4,
        num_games_per_iter=4,     # divisible by data axis (4)
        max_game_length=10,
        temperature_threshold=4,
        random_opening_moves=1,
        enable_resign=False,
        num_iterations=1,
        batch_size=16,
        num_epochs=1,
        min_buffer_size=8,
        eval_games=4,
        eval_simulations=2,
        eval_interval=1,
        save_interval=5,
        checkpoint_dir=str(tmp_path / "ckpt"),
        dtype="float32",
        max_buffer_size=2048,
        model_parallel=2,
    )
    tr = AlphaZeroTrainer(cfg)
    assert tr.mesh is not None and tr.mesh.devices.shape == (4, 2)
    assert tr._tp
    assert tuple(tr.params["Dense_0"]["kernel"].sharding.spec) == (
        None, "model",
    )
    stats = tr.run_iteration()
    assert stats["self_play"]["games"] == 4
    assert stats["training"]["batches"] > 0
    assert "win_rate" in stats["evaluation"]
    # a second iteration reuses compiled programs and catches any buffer
    # aliasing between the gate's param copies and the donated learner args
    stats2 = tr.run_iteration()
    assert stats2["training"]["batches"] > 0
    # the learner's candidate params are still TP after the full iteration
    # (whichever gate branch ran re-established the layout)
    assert tuple(tr.params["Dense_0"]["kernel"].sharding.spec) == (
        None, "model",
    )
    # actors' params replicated (or uncommitted single-device)
    bp = tr.best_params["Dense_0"]["kernel"]
    assert bp.is_fully_replicated
