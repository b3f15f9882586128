"""Sharding tests on the virtual 8-device CPU mesh (conftest forces
xla_force_host_platform_device_count=8): data-parallel train step and a
sharded self-play fleet must produce the same results as single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiangqi_alphazero_tpu.models import init_net
from xiangqi_alphazero_tpu.parallel import (
    batch_sharded,
    make_mesh,
    make_sharded_selfplay,
    make_sharded_train_step,
)
from xiangqi_alphazero_tpu.train.learner import (
    make_optimizer,
    set_learning_rate,
    train_step,
)
from xiangqi_alphazero_tpu.train.selfplay import SelfPlaySettings


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def _fake_batch(rng, b):
    boards = np.zeros((b, 90), np.int8)
    boards[:, :20] = rng.integers(-7, 8, (b, 20), dtype=np.int8)
    sides = np.where(rng.random(b) < 0.5, 1, -1).astype(np.int8)
    acts = rng.integers(0, 8100, (b, 8), dtype=np.int32)
    probs = rng.random((b, 8)).astype(np.float32)
    probs /= probs.sum(1, keepdims=True)
    z = np.where(rng.random(b) < 0.5, 1.0, -1.0).astype(np.float32)
    w = np.ones(b, np.float32)
    return boards, sides, acts, probs, z, w


def test_sharded_train_step_matches_single_device(mesh):
    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    tx = make_optimizer(1e-3, 1e-4)
    batch = _fake_batch(np.random.default_rng(0), 16)

    # copy before the first step: train_step donates its params buffers
    p2 = jax.tree.map(jnp.copy, variables["params"])
    s2 = variables["batch_stats"]

    p1, s1 = variables["params"], variables["batch_stats"]
    o1 = set_learning_rate(tx.init(p1), 1e-3)
    p1, s1, o1, m1 = train_step(
        net, tx, p1, s1, o1, *[jnp.asarray(x) for x in batch]
    )
    o2 = set_learning_rate(tx.init(p2), 1e-3)
    step = make_sharded_train_step(net, tx, mesh)
    sharded = [
        jax.device_put(jnp.asarray(x), batch_sharded(mesh)) for x in batch
    ]
    p2, s2, o2, m2 = step(p2, s2, o2, *sharded)

    np.testing.assert_allclose(
        float(m1.total_loss), float(m2.total_loss), rtol=1e-5
    )
    # cross-device reduction order perturbs gradients at float32 epsilon;
    # Adam normalization can amplify that on near-zero moments, so compare
    # with an absolute tolerance rather than elementwise-exact.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3
        )


def test_sharded_selfplay_runs(mesh):
    net, variables = init_net(jax.random.key(1), channels=8, blocks=1)
    settings = SelfPlaySettings(
        num_simulations=4,
        max_game_length=8,
        temperature_threshold=4,
        random_opening_moves=1,
        enable_resign=False,
        resign_check_steps=3,
    )
    run = make_sharded_selfplay(net, 16, settings, mesh)
    out = run(variables, jax.random.key(2))
    rec = np.asarray(out.rec)
    assert rec.any()
    # sharding survived: the output batch axis is laid out over the mesh
    assert out.boards.shape == (8, 16, 90)
    pi = np.asarray(out.pi_probs)[rec]
    np.testing.assert_allclose(pi.sum(-1), 1.0, rtol=1e-4)


def test_sharded_selfplay_gumbel(mesh):
    """The gumbel search's root machinery (top_k over candidates, halving
    re-sorts, per-lane forced roots) must shard over the game batch like
    the PUCT fleet does."""
    net, variables = init_net(jax.random.key(1), channels=8, blocks=1)
    settings = SelfPlaySettings(
        num_simulations=4,
        max_game_length=8,
        random_opening_moves=1,
        enable_resign=False,
        search_algo="gumbel",
        max_considered=4,
    )
    run = make_sharded_selfplay(net, 16, settings, mesh)
    out = run(variables, jax.random.key(2))
    rec = np.asarray(out.rec)
    assert rec.any()
    assert out.boards.shape == (8, 16, 90)
    pi = np.asarray(out.pi_probs)[rec]
    np.testing.assert_allclose(pi.sum(-1), 1.0, rtol=1e-4)
