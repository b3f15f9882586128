"""Arena driver: a clearly stronger net must win a temperature-sampled
color-halved match, and the counts must be consistent."""

import jax
import numpy as np

from xiangqi_alphazero_tpu.models import init_net
from xiangqi_alphazero_tpu.train.arena import ArenaSettings, make_hosted_arena


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
    all be identical (the deterministic eval driver's failure mode)."""
    net, v1 = init_net(jax.random.key(0), channels=8, blocks=1)
    s = ArenaSettings(num_simulations=4, max_game_length=10, temperature=1.0)

    # reuse internals to inspect final boards
    from xiangqi_alphazero_tpu.train import arena as A

    run = make_hosted_arena(net, net, 8, s)
    out = run(v1, v1, jax.random.key(3))
    del out

    init = jax.jit(lambda r: A._init_carry(8, r))(jax.random.key(3))
    from xiangqi_alphazero_tpu.models import policy_logits_fn

    body = A._make_body(
        policy_logits_fn(net, v1), policy_logits_fn(net, v1), 8, s
    )
    step = jax.jit(lambda c: body(c))
    c = init
    for _ in range(6):
        c = step(c)
    boards = np.asarray(c.states.board)
    assert not all(
        np.array_equal(boards[0], boards[i]) for i in range(1, 4)
    ), "games in the red half did not diverge"
