"""Gumbel root search: halving schedule math, visit accounting, candidate
restriction, degenerate cases, determinism, and the policy-improvement
property on a position with a known winning move.

The Gumbel search is an opt-in mode BEYOND the reference (it has only the
classic PUCT loop, reference: training/mcts.py:94-155), so there is no
host mirror to match bit-for-bit; these tests pin the algorithm's own
invariants instead (Danihelka et al., ICLR 2022 semantics).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xiangqi_alphazero_tpu.engine import env as E
from xiangqi_alphazero_tpu.engine.oracle import Position, decode_action
from xiangqi_alphazero_tpu.search import (
    GumbelConfig,
    halving_schedule,
    run_gumbel_mcts,
)


def _uniform_eval(feats):
    b = feats.shape[0]
    probs = jnp.full((b, 8100), 1.0 / 8100, jnp.float32)
    own = jnp.sum(feats[..., :7], axis=(1, 2, 3))
    opp = jnp.sum(feats[..., 7:14], axis=(1, 2, 3))
    return probs, (own - opp) / 8.0


def _roots(positions):
    states = [
        E.state_from_numpy(np.asarray(p.board, np.int8), p.side)
        for p in positions
    ]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def test_halving_schedule_properties():
    for budget, m in [(32, 16), (200, 16), (16, 16), (8, 4), (7, 4),
                      (50, 8), (1, 1), (5, 1), (100, 2)]:
        segs = halving_schedule(budget, m)
        assert sum(c for _, c in segs) == budget, (budget, m, segs)
        widths = [w for w, _ in segs]
        assert widths[0] <= m and all(w >= 1 for w in widths)
        assert all(a >= b for a, b in zip(widths, widths[1:])), segs


def test_visits_total_and_candidate_restriction():
    cfg = GumbelConfig(num_simulations=24, max_considered=4)
    res = jax.jit(
        lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg)
    )(_roots([Position()]), jax.random.key(0))
    visits = np.asarray(res.visits[0])
    valid = np.asarray(res.valid[0])
    assert visits.sum() == 24
    # every simulation lands on one of the m=4 Gumbel candidates
    assert (visits > 0).sum() <= 4
    assert set(np.flatnonzero(visits > 0)) <= set(np.flatnonzero(valid))
    # chosen is a legal action with positive visit count
    chosen = int(res.chosen[0])
    acts = np.asarray(res.actions[0])
    slot = int(np.flatnonzero(acts == chosen)[0])
    assert visits[slot] > 0
    assert chosen in set(Position().legal_actions())


def test_m1_all_visits_on_argmax():
    """m=1 degenerates to argmax(g + logits): every simulation visits that
    single candidate."""
    cfg = GumbelConfig(num_simulations=10, max_considered=1)
    res = jax.jit(
        lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg)
    )(_roots([Position()]), jax.random.key(3))
    visits = np.asarray(res.visits[0])
    assert visits.sum() == 10 and (visits > 0).sum() == 1
    assert int(res.chosen[0]) == int(
        np.asarray(res.actions[0])[int(np.argmax(visits))]
    )


def test_deterministic_given_key():
    cfg = GumbelConfig(num_simulations=16, max_considered=8)
    f = jax.jit(lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg))
    roots = _roots([Position()])
    a = f(roots, jax.random.key(7))
    b = f(roots, jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a.visits), np.asarray(b.visits))
    assert int(a.chosen[0]) == int(b.chosen[0])
    c = f(roots, jax.random.key(8))  # a different Gumbel sample may differ
    assert np.asarray(c.visits).sum() == 16


def test_pi_improved_is_distribution_over_legal():
    cfg = GumbelConfig(num_simulations=12, max_considered=4)
    pos = Position()
    res = jax.jit(
        lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg)
    )(_roots([pos]), jax.random.key(1))
    pi = np.asarray(res.pi_improved[0])
    valid = np.asarray(res.valid[0])
    assert abs(pi.sum() - 1.0) < 1e-4
    assert (pi[~valid] == 0).all()
    legal = set(pos.legal_actions())
    acts = np.asarray(res.actions[0])
    assert set(acts[pi > 0].tolist()) <= legal


def _capture_eval(feats):
    """Value = material lead of the side to move — any position after
    capturing the opponent's rook scores sharply better for the capturer,
    i.e. sharply WORSE (negated) for the side to move next."""
    b = feats.shape[0]
    probs = jnp.full((b, 8100), 1.0 / 8100, jnp.float32)
    own = jnp.sum(feats[..., :7], axis=(1, 2, 3))
    opp = jnp.sum(feats[..., 7:14], axis=(1, 2, 3))
    return probs, (own - opp) / 2.0


def test_policy_improvement_finds_free_capture():
    """Red pawn can capture black's undefended rook: with a material value
    function and uniform priors, the 16-sim Gumbel search must act the
    capture. The position has fewer legal moves than max_considered, so
    EVERY legal move is a candidate and the halving's value-driven
    elimination (not the Gumbel draw) decides."""
    pos = Position()
    board = np.zeros(90, np.int8)
    board[4] = 1        # red king (0,4)
    board[84] = -1      # black king (9,3)
    board[73] = 7       # red pawn (8,1), past the river
    board[74] = -5      # black rook (8,2) — capturable, undefended
    pos.board = board.tolist()
    pos.side = 1
    pos.history = []
    pos._legal_cache = None

    capture = 73 * 90 + 74  # pawn (8,1) takes (8,2)
    legal = pos.legal_actions()
    assert capture in legal and len(legal) <= 8, legal

    cfg = GumbelConfig(num_simulations=16, max_considered=8)
    res = jax.jit(
        lambda r, k: run_gumbel_mcts(_capture_eval, r, k, cfg)
    )(_roots([pos]), jax.random.key(11))
    assert int(res.chosen[0]) == capture, (
        decode_action(int(res.chosen[0])),
        np.asarray(res.visits[0])[np.asarray(res.visits[0]) > 0],
    )
    # and the improved policy concentrates on it
    acts = np.asarray(res.actions[0])
    slot = int(np.flatnonzero(acts == capture)[0])
    pi = np.asarray(res.pi_improved[0])
    assert pi[slot] == pi.max()


def test_terminal_root_is_noop():
    """A finished game searches to zero visits and chosen=-1."""
    pos = Position()
    board = np.zeros(90, np.int8)
    board[4] = 1  # lone red king: black (to move) has its king gone -> over
    pos.board = board.tolist()
    pos.side = -1
    pos.history = []
    pos._legal_cache = None
    cfg = GumbelConfig(num_simulations=8, max_considered=4)
    res = jax.jit(
        lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg)
    )(_roots([pos]), jax.random.key(2))
    assert np.asarray(res.visits).sum() == 0
    assert int(res.chosen[0]) == -1


def test_gumbel_serving_predictor():
    """The serving path: Predictor(algo='gumbel') produces the standard
    analysis payload, acts the halving winner, and session-style batched
    search carries the chosen action per lane."""
    from xiangqi_alphazero_tpu.models import init_net
    from xiangqi_alphazero_tpu.serve.predictor import Predictor

    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    pred = Predictor(net, variables, num_simulations=12, algo="gumbel")
    pos = Position()
    search = pred.search_position(pos)
    assert len(search) == 4 and search[3] >= 0
    res = pred.ai_move_from_search(pos.copy(), search)
    assert res["ai_move"]["action"] == search[3]
    sel = [m for m in res["ai_analysis"]["top_moves"] if m["selected"]]
    assert len(sel) == 1 and sel[0]["action"] == search[3] and sel[0]["legal"]

    lanes = pred.search_batch([Position(), Position()], pad_to=2)
    assert all(len(lane) == 4 for lane in lanes)
    legal = set(Position().legal_actions())
    # each lane draws its own Gumbel row, so picks may differ — but every
    # pick must be a legal, visited candidate
    for acts, vis, _, chosen in lanes:
        assert chosen in legal
        assert vis[int(np.flatnonzero(acts == chosen)[0])] > 0

    clone = pred.with_simulations(24)
    assert clone.algo == "gumbel" and clone.num_simulations == 24


def test_gumbel_selfplay_games():
    """search_algo='gumbel' plays whole games: recorded pi rows are the
    improved policy (a distribution over the recorded slots), every acted
    move was legal (games reach verdicts), and plies advance."""
    from xiangqi_alphazero_tpu.models import init_net, policy_logits_fn
    from xiangqi_alphazero_tpu.train.selfplay import (
        SelfPlaySettings,
        selfplay_games,
    )

    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    s = SelfPlaySettings(
        num_simulations=8,
        max_game_length=24,
        random_opening_moves=2,
        enable_resign=False,
        search_algo="gumbel",
        max_considered=4,
    )
    out = jax.jit(
        lambda r: selfplay_games(
            policy_logits_fn(net, variables), 8, r, s, logits_eval=True
        )
    )(jax.random.key(2))
    rec = np.asarray(out.rec)
    assert rec.any()
    sums = np.asarray(out.pi_probs).sum(axis=-1)[rec]
    np.testing.assert_allclose(sums, 1.0, atol=1e-4)
    assert (np.asarray(out.plies) > 0).all()
    assert set(np.asarray(out.winners).tolist()) <= {-1, 0, 1}


def test_gumbel_training_iteration(tmp_path):
    """A full train iteration with the gumbel self-play search learns on
    improved-policy targets end-to-end."""
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
        search_algo="gumbel", max_considered=4,
        seed=3,
    )
    tr = AlphaZeroTrainer(cfg)
    stats = tr.run_iteration()
    assert stats["self_play"]["new_samples"] > 0
    assert np.isfinite(stats["training"]["policy_loss"])
    assert np.isfinite(stats["training"]["value_loss"])


def test_batch_games_search_independently():
    cfg = GumbelConfig(num_simulations=16, max_considered=8)
    import random

    p2 = Position()
    rng = random.Random(4)
    for _ in range(6):
        p2.apply(rng.choice(p2.legal_actions()))
    f = jax.jit(lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg))
    both = f(_roots([Position(), p2]), jax.random.key(5))
    solo0 = f(_roots([Position(), Position()]), jax.random.key(5))
    # lane 0 identical whatever rides in lane 1? Not guaranteed: the Gumbel
    # sample is drawn over the [B, K] batch, so lane noise depends on B's
    # layout but not on lane 1's CONTENT:
    np.testing.assert_array_equal(
        np.asarray(both.visits[0]), np.asarray(solo0.visits[0])
    )
    assert np.asarray(both.visits[1]).sum() == 16


def test_m_clamped_to_budget_chosen_always_visited():
    """sims < max_considered: m clamps to the budget so every candidate
    gets a phase-0 visit and the acted move is always search-backed."""
    cfg = GumbelConfig(num_simulations=6, max_considered=16)
    res = jax.jit(
        lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg)
    )(_roots([Position()]), jax.random.key(9))
    visits = np.asarray(res.visits[0])
    assert visits.sum() == 6 and (visits > 0).sum() <= 6
    acts = np.asarray(res.actions[0])
    slot = int(np.flatnonzero(acts == int(res.chosen[0]))[0])
    assert visits[slot] > 0


def test_zero_budget_returns_prior_argmax():
    """num_simulations=0 must not crash: the chosen move is the
    g+logits argmax (pure policy sample), with zero visits."""
    assert halving_schedule(0, 8) == [(8, 0)]
    cfg = GumbelConfig(num_simulations=0, max_considered=8)
    res = jax.jit(
        lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg)
    )(_roots([Position()]), jax.random.key(4))
    assert np.asarray(res.visits).sum() == 0
    assert int(res.chosen[0]) in set(Position().legal_actions())


def test_lane_noise_is_batch_width_independent():
    """Lane i draws Gumbel noise from split key i, so the same position at
    lane 0 gets the identical search whether it rides a width-1 or width-4
    batch — the property coalesced serving relies on."""
    cfg = GumbelConfig(num_simulations=12, max_considered=8)
    f = jax.jit(lambda r, k: run_gumbel_mcts(_uniform_eval, r, k, cfg))
    w1 = f(_roots([Position()]), jax.random.key(6))
    w4 = f(_roots([Position()] * 4), jax.random.key(6))
    np.testing.assert_array_equal(
        np.asarray(w1.visits[0]), np.asarray(w4.visits[0])
    )
    assert int(w1.chosen[0]) == int(w4.chosen[0])


def test_gumbel_forces_parallel_loop_semantics():
    """temperature_schedule='anneal' must not change the cap/resign
    semantics under gumbel (gumbel has no temperature at all)."""
    from xiangqi_alphazero_tpu.train.selfplay import (
        SelfPlaySettings,
        _is_serial,
    )

    assert _is_serial(SelfPlaySettings(temperature_schedule="anneal"))
    assert not _is_serial(
        SelfPlaySettings(temperature_schedule="anneal", search_algo="gumbel")
    )
    assert not _is_serial(SelfPlaySettings())
