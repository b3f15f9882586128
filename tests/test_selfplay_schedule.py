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
