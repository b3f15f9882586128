"""Differential tests: vectorized JAX env vs the pure-Python oracle.

The acceptance gate for the whole engine layer (SURVEY.md §7 phase 1): the
JAX env must reproduce the oracle's legal-move sets, terminal verdicts,
features and material bit-exactly along random playouts — the same harness
shape the reference uses for Python-vs-Cython (training/test_cython.py).
"""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiangqi_alphazero_tpu.engine import env as E
from xiangqi_alphazero_tpu.engine.oracle import Position

_jit_step = E.step_jit
_jit_features = E.features_jit
_jit_material = E.material_jit
_jit_check = E.is_in_check_jit
_jit_legal = E.legal_mask_jit


def _mask_to_set(mask: np.ndarray) -> set:
    return set(np.nonzero(mask)[0].tolist())


def test_initial_position_parity():
    s = E.reset_jit()
    p = Position()
    assert _mask_to_set(np.asarray(s.legal)) == set(p.legal_actions())
    assert len(p.legal_actions()) == 44
    assert not bool(s.done)
    f_env = np.asarray(_jit_features(s.board, s.side))  # NHWC
    f_ora = p.features()  # NCHW
    assert np.array_equal(f_env.transpose(2, 0, 1), f_ora)


@pytest.mark.parametrize("seed", range(6))
def test_random_playout_parity(seed):
    rng = random.Random(seed)
    p = Position()
    s = E.reset_jit()
    for ply in range(140):
        env_legal = _mask_to_set(np.asarray(s.legal))
        ora_legal = set(p.legal_actions())
        assert env_legal == ora_legal, (
            f"seed {seed} ply {ply}: env-only={env_legal - ora_legal} "
            f"oracle-only={ora_legal - env_legal}\n{p.render()}"
        )
        done_o, win_o = p.result()
        assert bool(s.done) == done_o, f"seed {seed} ply {ply}: done mismatch"
        if done_o:
            assert int(s.winner) == win_o, f"seed {seed} ply {ply}: winner"
            break
        assert int(_jit_material(s.board, jnp.int8(1))) == p.material(1)
        assert int(_jit_material(s.board, jnp.int8(-1))) == p.material(-1)
        a = rng.choice(sorted(ora_legal))
        p.apply(a)
        s = _jit_step(s, jnp.int32(a))
        f_env = np.asarray(_jit_features(s.board, s.side))
        assert np.array_equal(f_env.transpose(2, 0, 1), p.features())


def test_batched_step_lockstep():
    """A batch of games stepping different actions matches per-game oracles."""
    B = 16
    rng = random.Random(99)
    oracles = [Position() for _ in range(B)]
    states = E.reset_batch_jit(B)
    step_b = E.v_step_jit
    for ply in range(60):
        legal = np.asarray(states.legal)
        acts = []
        for i, p in enumerate(oracles):
            done_o, _ = p.result()
            env_done = bool(np.asarray(states.done)[i])
            assert env_done == done_o, f"game {i} ply {ply}"
            if done_o:
                acts.append(0)  # ignored: env freezes finished games
                continue
            ora = p.legal_actions()
            assert _mask_to_set(legal[i]) == set(ora), f"game {i} ply {ply}"
            a = rng.choice(ora)
            p.apply(a)
            acts.append(a)
        states = step_b(states, jnp.asarray(acts, jnp.int32))


def test_check_detection_parity():
    rng = random.Random(7)
    p = Position()
    s = E.reset_jit()
    for _ in range(80):
        done_o, _ = p.result()
        if done_o:
            break
        for side in (1, -1):
            assert bool(_jit_check(s.board, jnp.int8(side))) == p.in_check(side)
        a = rng.choice(p.legal_actions())
        p.apply(a)
        s = _jit_step(s, jnp.int32(a))


def test_mirror_tables():
    p = Position()
    s = E.reset_jit()
    mb = np.asarray(jax.jit(E.mirror_board)(s.board)).reshape(10, 9)
    assert np.array_equal(mb, np.asarray(s.board).reshape(10, 9)[:, ::-1])
    # mirrored legal mask == legal mask of mirrored board
    legal = np.asarray(s.legal)
    mirrored_legal = np.asarray(
        _jit_legal(jax.jit(E.mirror_board)(s.board), s.side)
    )
    perm = np.asarray(jax.jit(E.mirror_actions)(jnp.arange(E.ACTION_SPACE)))
    assert np.array_equal(legal[perm], mirrored_legal)


def test_state_from_numpy_roundtrip():
    p = Position()
    rng = random.Random(3)
    for _ in range(10):
        p.apply(rng.choice(p.legal_actions()))
    # rebuild hist ring the way step() maintains it (pre-move snapshots)
    hist = np.zeros((E.HIST_LEN, 90), np.int8)
    for i, h in enumerate(p.history[-E.HIST_LEN:]):
        idx = (p.ply - min(len(p.history), E.HIST_LEN) + i) % E.HIST_LEN
        hist[idx] = np.frombuffer(h, np.uint8).astype(np.int8)
    s = E.state_from_numpy(p.board_array(), p.side, p.ply, p.quiet, hist)
    assert _mask_to_set(np.asarray(s.legal)) == set(p.legal_actions())
