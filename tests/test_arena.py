"""Arena driver: counts must be consistent, and temperature sampling must
make games within a color half diverge (the deterministic eval driver's
failure mode for strength matches)."""

import jax
import numpy as np

from xiangqi_alphazero_tpu.models import init_net, policy_logits_fn
from xiangqi_alphazero_tpu.train import evaluate as EV
from xiangqi_alphazero_tpu.train.arena import (
    ArenaSettings,
    _sampler,
    make_hosted_arena,
)


def test_arena_counts_consistent():
    net, v1 = init_net(jax.random.key(0), channels=8, blocks=1)
    _, v2 = init_net(jax.random.key(9), channels=8, blocks=1)
    s = ArenaSettings(num_simulations=4, max_game_length=24, temperature=0.5)
    run = make_hosted_arena(net, net, 8, s)
    out = run(v1, v2, jax.random.key(1))
    assert out["games"] == 8
    assert out["a_wins"] + out["b_wins"] + out["draws"] == 8
    assert 0.0 <= out["a_score"] <= 1.0
    assert out["avg_plies"] > 0


def test_arena_games_diverge_under_temperature():
    """With temp > 0 and per-game RNG, games within a color half must not
    all be identical. Drives the SHARED evaluate._make_body with the
    arena's temperature samplers (arena is a thin wrapper over it)."""
    net, v1 = init_net(jax.random.key(0), channels=8, blocks=1)
    s = EV.EvalSettings(num_simulations=4, max_game_length=10)

    init = jax.jit(lambda r: EV._init_carry(8, r))(jax.random.key(3))
    sel = _sampler(4, temperature=1.0)
    body = EV._make_body(
        policy_logits_fn(net, v1), policy_logits_fn(net, v1), 8, s,
        logits_eval=True, select_new=sel, select_old=sel,
    )
    step = jax.jit(lambda c: body(c))
    c = init
    for _ in range(6):
        c = step(c)
    boards = np.asarray(c.states.board)
    assert not all(
        np.array_equal(boards[0], boards[i]) for i in range(1, 4)
    ), "games in the red half did not diverge"


def test_arena_mixed_algorithms():
    """gumbel-vs-puct with per-side budgets drives the search hooks in the
    shared eval body: counts stay consistent and both sides play."""
    net, v1 = init_net(jax.random.key(0), channels=8, blocks=1)
    _, v2 = init_net(jax.random.key(9), channels=8, blocks=1)
    s = ArenaSettings(
        num_simulations=8, max_game_length=20, temperature=0.5,
        algo_a="gumbel", algo_b="puct", sims_a=8, sims_b=4,
        max_considered=4,
    )
    run = make_hosted_arena(net, net, 8, s)
    out = run(v1, v2, jax.random.key(2))
    assert out["a_wins"] + out["b_wins"] + out["draws"] == 8
    assert out["avg_plies"] > 1  # both sides produced legal moves
