"""Playout-cap randomization (KataGo arXiv:1902.10565 §3.1, opt-in):
cheap plies record value-only samples (all-zero pi rows), the learner's
policy loss averages only over target-carrying rows, and the capped
self-play loop mixes full and cheap searches per ply."""

import numpy as np

import jax
import jax.numpy as jnp

from xiangqi_alphazero_tpu.models import init_net, policy_logits_fn
from xiangqi_alphazero_tpu.train.learner import make_optimizer, train_step
from xiangqi_alphazero_tpu.train.selfplay import (
    SelfPlaySettings,
    selfplay_games,
)


def _batch(rng, n, k=8, zero_pi_rows=()):
    boards = np.zeros((n, 90), np.int8)
    boards[:, :16] = rng.integers(-7, 8, (n, 16), dtype=np.int8)
    sides = np.ones(n, np.int8)
    pa = rng.integers(0, 8100, (n, k)).astype(np.int32)
    pp = np.full((n, k), 1.0 / k, np.float32)
    for i in zero_pi_rows:
        pp[i] = 0.0
    z = rng.random(n).astype(np.float32)
    w = np.ones(n, np.float32)
    return boards, sides, pa, pp, z, w


def test_policy_loss_ignores_value_only_rows():
    """A batch where half the rows are value-only must produce the same
    policy loss and policy GRADIENT as the same batch with those rows
    weighted out entirely; value loss still counts every row."""
    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    tx = make_optimizer(1e-3, 0.0)
    params, stats = variables["params"], variables["batch_stats"]
    opt = tx.init(params)
    rng = np.random.default_rng(0)
    boards, sides, pa, pp, z, w = _batch(rng, 8, zero_pi_rows=(1, 3, 5, 7))

    p1, _, _, m1 = train_step(net, tx, params, stats, opt, boards, sides,
                              pa, pp, z, w)

    # reference computation: only rows with targets, by hand, in the SAME
    # train-mode batch-norm the step uses
    feats_rows = [0, 2, 4, 6]
    net2, variables2 = init_net(jax.random.key(0), channels=8, blocks=1)
    params2, stats2 = variables2["params"], variables2["batch_stats"]
    from xiangqi_alphazero_tpu.engine import env as E

    (logits, _), _ = net2.apply(
        {"params": params2, "batch_stats": stats2},
        E.v_features(jnp.asarray(boards), jnp.asarray(sides)),
        train=True, mutable=["batch_stats"],
    )
    logp = jax.nn.log_softmax(logits, -1)
    ce = -np.sum(
        pp * np.asarray(jnp.take_along_axis(logp, jnp.asarray(pa), -1)),
        axis=-1,
    )
    want_policy = ce[feats_rows].mean()
    assert abs(float(m1.policy_loss) - want_policy) < 1e-4, (
        float(m1.policy_loss), want_policy,
    )

    # all-zero-pi batch: policy loss exactly 0, value loss finite
    # (train_step donates params/opt_state — fresh copies for the 2nd call)
    params3 = jax.tree.map(jnp.array, params2)
    opt3 = tx.init(params3)
    pp0 = np.zeros_like(pp)
    _, _, _, m0 = train_step(net, tx, params3, stats, opt3, boards, sides,
                             pa, pp0, z, w)
    assert float(m0.policy_loss) == 0.0
    assert np.isfinite(float(m0.value_loss))


def test_capped_selfplay_mixes_full_and_cheap():
    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    s = SelfPlaySettings(
        num_simulations=8,
        max_game_length=24,
        random_opening_moves=0,
        enable_resign=False,
        playout_cap_prob=0.5,
        playout_cap_sims=2,
    )
    out = jax.jit(
        lambda r: selfplay_games(
            policy_logits_fn(net, variables), 8, r, s, logits_eval=True
        )
    )(jax.random.key(3))
    rec = np.asarray(out.rec)
    pp = np.asarray(out.pi_probs)
    sums = pp.sum(axis=-1)
    # recorded plies are either full (pi sums to 1) or cheap (all-zero)
    rec_sums = sums[rec]
    full = rec_sums > 0.5
    np.testing.assert_allclose(rec_sums[full], 1.0, atol=1e-4)
    np.testing.assert_allclose(rec_sums[~full], 0.0, atol=1e-7)
    # at p=0.5 over >=16 recorded plies both kinds occur
    assert full.any() and (~full).any(), rec_sums
    # value labels are still set for cheap plies (value-only samples)
    assert set(np.asarray(out.winners).tolist()) <= {-1, 0, 1}


def test_budget_masked_search_equals_unmasked():
    """search/mcts.py sim_budget correctness: with per-game budgets
    [full, small], each game's visits/value must equal the corresponding
    UNMASKED search (same rng) — i.e. a budget-masked simulation is a
    true no-op for that game."""
    from tests.test_mcts import _jax_eval
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.search import mcts as M

    roots = E.reset_batch_jit(2)
    key = jax.random.key(9)
    cfg_full = M.MCTSConfig(num_simulations=24)
    cfg_small = M.MCTSConfig(num_simulations=6)
    budget = jnp.asarray([24, 6], jnp.int32)

    masked = jax.jit(
        lambda r, k: M.run_mcts(_jax_eval, r, k, cfg_full, sim_budget=budget)
    )(roots, key)
    full = jax.jit(
        lambda r, k: M.run_mcts(_jax_eval, r, k, cfg_full)
    )(roots, key)
    small = jax.jit(
        lambda r, k: M.run_mcts(_jax_eval, r, k, cfg_small)
    )(roots, key)

    np.testing.assert_array_equal(
        np.asarray(masked.visits[0]), np.asarray(full.visits[0])
    )
    np.testing.assert_array_equal(
        np.asarray(masked.visits[1]), np.asarray(small.visits[1])
    )
    np.testing.assert_allclose(
        float(masked.root_value[0]), float(full.root_value[0]), atol=1e-6
    )
    np.testing.assert_allclose(
        float(masked.root_value[1]), float(small.root_value[1]), atol=1e-6
    )


def test_noise_mask_off_equals_noiseless():
    """noise_mask=all-False under add_noise=True == add_noise=False."""
    from tests.test_mcts import _jax_eval
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.search import mcts as M

    roots = E.reset_batch_jit(2)
    key = jax.random.key(4)
    cfg = M.MCTSConfig(num_simulations=12)
    masked = jax.jit(
        lambda r, k: M.run_mcts(
            _jax_eval, r, k, cfg, add_noise=True,
            noise_mask=jnp.zeros(2, bool),
        )
    )(roots, key)
    plain = jax.jit(
        lambda r, k: M.run_mcts(_jax_eval, r, k, cfg, add_noise=False)
    )(roots, key)
    np.testing.assert_array_equal(
        np.asarray(masked.visits), np.asarray(plain.visits)
    )


def _run_capped(per_game: bool, batch: int = 8, seed: int = 3):
    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    s = SelfPlaySettings(
        num_simulations=8,
        max_game_length=24,
        random_opening_moves=0,
        enable_resign=False,
        playout_cap_prob=0.5,
        playout_cap_sims=2,
        playout_cap_per_game=per_game,
    )
    out = jax.jit(
        lambda r: selfplay_games(
            policy_logits_fn(net, variables), batch, r, s, logits_eval=True
        )
    )(jax.random.key(seed))
    rec = np.asarray(out.rec)                      # [T, B]
    full = np.asarray(out.pi_probs).sum(-1) > 0.5  # [T, B]
    return rec, full


def test_per_game_cap_target_mix():
    """per_game=True: independent coin per (game, move) — KataGo §3.1.
    Within a single ply, full and cheap games must COEXIST (exactly what
    the batch-global coin can never produce), and the overall full-search
    fraction must sit in a tight Binomial band around p."""
    rec, full = _run_capped(per_game=True)
    mixed_plies = 0
    for t in range(rec.shape[0]):
        r = rec[t]
        if r.sum() >= 2:
            k = full[t][r].sum()
            if 0 < k < r.sum():
                mixed_plies += 1
    assert mixed_plies >= 3, "per-game coins must mix within plies"
    n = int(rec.sum())
    frac = float(full[rec].sum()) / n
    # p=0.5; 4-sigma Binomial band
    band = 4 * 0.5 / np.sqrt(n)
    assert abs(frac - 0.5) < band, (frac, n)


def test_global_cap_coin_is_batch_global():
    """per_game=False (the compute lever): within every ply the recorded
    rows agree — all-full or all-cheap — and the per-ply coin sequence
    still mixes both kinds."""
    rec, full = _run_capped(per_game=False)
    kinds = set()
    for t in range(rec.shape[0]):
        r = rec[t]
        if r.any():
            vals = set(full[t][r].tolist())
            assert len(vals) == 1, f"ply {t} mixed under a global coin"
            kinds |= vals
    assert kinds == {True, False}


def test_per_game_cap_rejects_gumbel():
    import pytest

    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    s = SelfPlaySettings(
        search_algo="gumbel",
        playout_cap_prob=0.5,
        playout_cap_sims=2,
        playout_cap_per_game=True,
    )
    with pytest.raises(ValueError, match="per_game"):
        selfplay_games(
            policy_logits_fn(net, variables), 4, jax.random.key(0), s,
            logits_eval=True,
        )


def test_capped_training_iteration(tmp_path):
    from xiangqi_alphazero_tpu.train.config import TrainingConfig
    from xiangqi_alphazero_tpu.train.trainer import AlphaZeroTrainer

    cfg = TrainingConfig(
        num_channels=8, num_res_blocks=1,
        num_simulations=8, eval_simulations=4,
        num_games_per_iter=2, eval_games=2,
        max_game_length=16, batch_size=16, num_epochs=1,
        min_buffer_size=1, enable_resign=False,
        random_opening_moves=1,
        checkpoint_dir=str(tmp_path / "ckpt"),
        playout_cap_prob=0.5, playout_cap_sims=2,
        seed=5,
    )
    tr = AlphaZeroTrainer(cfg)
    st = tr.run_iteration()
    assert st["self_play"]["new_samples"] > 0
    assert np.isfinite(st["training"]["policy_loss"])
    assert np.isfinite(st["training"]["value_loss"])
