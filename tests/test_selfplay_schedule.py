"""Temperature-schedule tests: the serial linear anneal (reference
train.py:250-255) next to the parallel binary schedule
(parallel_selfplay.py:89-92), and pi extraction under both."""

import jax
import jax.numpy as jnp
import numpy as np

from xiangqi_alphazero_tpu.train.selfplay import (
    SelfPlaySettings,
    selfplay_games,
    temperature_at,
)


def _ref_serial_temp(step: int, thr: int) -> float:
    """Verbatim reference formula (train.py:250-255)."""
    if step < thr:
        return 1.0
    if step < thr + 10:
        return 1.0 - 0.9 * (step - thr) / 10
    return 0.1


def test_anneal_matches_reference_formula():
    s = SelfPlaySettings(temperature_threshold=15,
                         temperature_schedule="anneal")
    plies = jnp.arange(40)
    got = np.asarray(jax.jit(lambda p: temperature_at(p, s))(plies))
    want = np.array([_ref_serial_temp(p, 15) for p in range(40)], np.float32)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_binary_schedule_unchanged():
    s = SelfPlaySettings(temperature_threshold=15)
    plies = jnp.arange(40)
    got = np.asarray(jax.jit(lambda p: temperature_at(p, s))(plies))
    want = np.where(np.arange(40) < 15, 1.0, 0.3).astype(np.float32)
    np.testing.assert_allclose(got, want)


def test_selfplay_runs_with_anneal_and_pi_is_valid():
    from xiangqi_alphazero_tpu.models import init_net, policy_logits_fn

    net, variables = init_net(jax.random.key(0), channels=8, blocks=1)
    s = SelfPlaySettings(
        num_simulations=4,
        max_game_length=30,
        temperature_threshold=4,
        temperature_schedule="anneal",
        random_opening_moves=2,
        enable_resign=False,
    )
    out = jax.jit(
        lambda r: selfplay_games(
            policy_logits_fn(net, variables), 8, r, s, logits_eval=True
        )
    )(jax.random.key(1))
    rec = np.asarray(out.rec)
    probs = np.asarray(out.pi_probs)
    sums = probs.sum(axis=-1)[rec]
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)
    assert (np.asarray(out.plies) > 0).all()


def test_anneal_clock_excludes_openings():
    """The serial anneal is clocked by RECORDED steps (reference
    train.py:249 sets step=0 after make_random_opening), not total plies:
    with openings forced on, early recorded moves must still be sampled at
    temperature 1.0. Pinned structurally: the body passes n_rec (not
    states.ply) to temperature_at in anneal mode."""
    import inspect

    from xiangqi_alphazero_tpu.train import selfplay as SP

    src = inspect.getsource(SP._make_body)
    assert "c.n_rec if serial else c.states.ply" in src


def test_serial_cap_is_draw_parallel_cap_adjudicates():
    """Reference serial loop ends capped games as draws (train.py:286-289);
    the parallel loop material-adjudicates (parallel_selfplay.py:79-89).
    Both run from a lopsided midgame position under a tiny cap."""
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.train.selfplay import _finalize, _init_carry

    # red up a rook + cannon (> 30 material): adjudication favors red
    board = np.zeros(90, np.int8)
    board[0 * 9 + 3] = 1      # red king
    board[9 * 9 + 4] = -1     # black king
    board[4 * 9 + 0] = 5      # red rook
    board[4 * 9 + 8] = 6      # red cannon
    st = E.state_from_numpy(board, 1)

    for schedule, want in (("binary", 1), ("anneal", 0)):
        s = SelfPlaySettings(
            max_game_length=4, temperature_schedule=schedule,
            random_opening_moves=0, enable_resign=False,
        )
        carry = jax.jit(
            lambda r, s=s: _init_carry(2, r, s)
        )(jax.random.key(0))
        states = jax.tree.map(lambda x: jnp.stack([x, x]), st)
        carry = carry._replace(states=states, t=jnp.int32(4))
        out = jax.jit(lambda c, s=s: _finalize(c, s))(carry)
        assert np.asarray(out.winners).tolist() == [want, want], schedule


def test_parallel_resign_overrides_terminal_draw():
    """parallel_selfplay.py:107-121 checks resign on the post-move state
    with no terminal check in between: forced resign verdicts beat the
    board's own (drawn) verdict in _finalize; the serial loop checks
    game-over first, so done games keep their draw."""
    from xiangqi_alphazero_tpu.engine import env as E
    from xiangqi_alphazero_tpu.train.selfplay import _finalize, _init_carry

    board = np.zeros(90, np.int8)
    board[0 * 9 + 3] = 1
    board[9 * 9 + 4] = -1
    st = E.state_from_numpy(board, 1)

    s = SelfPlaySettings(max_game_length=50, enable_resign=True)
    carry = jax.jit(lambda r: _init_carry(2, r, s))(jax.random.key(0))
    states = jax.tree.map(lambda x: jnp.stack([x, x]), st)
    # game 0: drawn terminal that a resign trigger overrode (mover = red)
    states = states.replace(
        done=jnp.array([True, True]),
        winner=jnp.array([0, 0], jnp.int8),
    )
    carry = carry._replace(
        states=states,
        forced=jnp.array([True, False]),
        forced_winner=jnp.array([1, 0], jnp.int8),
        t=jnp.int32(20),
    )
    out = jax.jit(lambda c: _finalize(c, s))(carry)
    assert np.asarray(out.winners).tolist() == [1, 0]
