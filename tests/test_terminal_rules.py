"""Differential env-vs-oracle tests for the LONG-HORIZON terminal rules.

Random-playout parity (test_env_parity.py) rarely reaches the quiet>=120
draw, the ply>=200 material adjudication, or the 3-in-12 repetition rule —
these tests construct each branch directly via ``state_from_numpy`` /
scripted move loops and assert the vectorized env (engine/env.py:347-384)
against the oracle (reference semantics: game.py:565-616) on the exact
boundary plies. Mirrors the depth of the reference's own differential
harness (reference: training/test_cython.py:87-123).
"""

import random

import jax.numpy as jnp
import numpy as np

from xiangqi_alphazero_tpu.engine import env as E
from xiangqi_alphazero_tpu.engine.oracle import Position

K, R = 1, 5  # piece codes


def _sq(r, c):
    return r * 9 + c


def _act(f, t):
    return f * 90 + t


def _pair(board, side, ply=0, quiet=0):
    """(oracle, env state) from the same raw position (fresh history)."""
    p = Position()
    p.board = [int(x) for x in board]
    p.side = side
    p.ply = ply
    p.quiet = quiet
    p.history = []
    p._legal_cache = None
    s = E.state_from_numpy(np.asarray(board, np.int8), side, ply, quiet)
    return p, s


def _assert_same(p, s, msg=""):
    done_o, win_o = p.result()
    assert bool(s.done) == done_o, f"{msg}: done env={bool(s.done)} ora={done_o}"
    if done_o:
        assert int(s.winner) == win_o, f"{msg}: winner"
    else:
        env_legal = set(np.nonzero(np.asarray(s.legal))[0].tolist())
        assert env_legal == set(p.legal_actions()), msg


def _board_kings(extra=()):
    b = np.zeros(90, np.int8)
    b[_sq(0, 3)] = K
    b[_sq(9, 5)] = -K
    for sq, piece in extra:
        b[sq] = piece
    return b


def test_quiet_draw_at_120():
    """119 quiet plies + one more non-capture -> draw on BOTH; a capture at
    119 resets the counter on both instead."""
    board = _board_kings([(_sq(4, 0), R), (_sq(5, 8), -R)])
    p, s = _pair(board, 1, ply=150, quiet=119)
    _assert_same(p, s, "pre-move")
    a = _act(_sq(4, 0), _sq(4, 1))  # quiet rook slide
    p.apply(a)
    s = E.step_jit(s, jnp.int32(a))
    assert p.quiet == 120 and int(s.quiet) == 120
    _assert_same(p, s, "quiet=120")
    assert bool(s.done) and int(s.winner) == 0

    # capture branch: red rook takes the black rook -> counter resets
    board2 = _board_kings([(_sq(4, 0), R), (_sq(4, 8), -R)])
    p2, s2 = _pair(board2, 1, ply=150, quiet=119)
    cap = _act(_sq(4, 0), _sq(4, 8))
    p2.apply(cap)
    s2 = E.step_jit(s2, jnp.int32(cap))
    assert p2.quiet == 0 and int(s2.quiet) == 0
    _assert_same(p2, s2, "capture reset")
    assert not bool(s2.done)


def test_material_adjudication_at_200():
    """ply>=200 adjudication, all three outcomes (|diff|>30 with
    R=90: red win / black win / draw on kings-only diff=0)."""
    cases = [
        ([(_sq(4, 0), R)], 1),    # red up a rook: diff=+90 -> red
        ([(_sq(5, 8), -R)], -1),  # black up a rook -> black
        ([], 0),                  # bare kings -> draw
    ]
    for extra, want in cases:
        board = _board_kings(extra)
        p, s = _pair(board, 1, ply=199, quiet=10)
        _assert_same(p, s, f"pre {want}")
        assert not bool(s.done)
        a = p.legal_actions()[0]
        p.apply(a)
        s = E.step_jit(s, jnp.int32(a))
        _assert_same(p, s, f"adjudicated {want}")
        assert bool(s.done) and int(s.winner) == want


def test_threefold_repetition_draw():
    """Rook shuttle from the opening: the start-of-cycle position recurs at
    plies 4, 8, 12 -> both implementations call the draw exactly at ply 12
    (current position == 3 of the last 12 pre-move snapshots)."""
    p = Position()
    s = E.reset_jit()
    cycle = [
        _act(_sq(0, 0), _sq(1, 0)),  # red rook up
        _act(_sq(9, 0), _sq(8, 0)),  # black rook down
        _act(_sq(1, 0), _sq(0, 0)),  # red rook back
        _act(_sq(8, 0), _sq(9, 0)),  # black rook back
    ]
    for ply in range(12):
        a = cycle[ply % 4]
        assert a in p.legal_actions()
        p.apply(a)
        s = E.step_jit(s, jnp.int32(a))
        done_o, win_o = p.result()
        assert bool(s.done) == done_o, f"ply {ply + 1}"
        if ply + 1 < 12:
            assert not done_o, f"ply {ply + 1}: premature repetition call"
    assert bool(s.done) and done_o
    assert int(s.winner) == 0 and win_o == 0


def test_repetition_window_expiry():
    """Two early recurrences pushed OUT of the 12-snapshot window must not
    count: shuttle twice (recurrences at plies 4 and 8), break the pattern
    for 6 plies with king+advisor-area moves, then the old snapshots age
    out — no draw before 12 fresh shuttle plies complete."""
    p = Position()
    s = E.reset_jit()
    shuttle = [
        _act(_sq(0, 0), _sq(1, 0)), _act(_sq(9, 0), _sq(8, 0)),
        _act(_sq(1, 0), _sq(0, 0)), _act(_sq(8, 0), _sq(9, 0)),
    ]
    other = [
        _act(_sq(0, 8), _sq(1, 8)), _act(_sq(9, 8), _sq(8, 8)),
        _act(_sq(1, 8), _sq(2, 8)), _act(_sq(8, 8), _sq(7, 8)),
        _act(_sq(2, 8), _sq(1, 8)), _act(_sq(7, 8), _sq(8, 8)),
    ]
    seq = shuttle + shuttle + other
    for i, a in enumerate(seq):
        assert a in p.legal_actions(), f"ply {i}"
        p.apply(a)
        s = E.step_jit(s, jnp.int32(a))
        done_o, _ = p.result()
        assert bool(s.done) == done_o, f"ply {i + 1}"
        assert not done_o, f"ply {i + 1}: false repetition"


def test_wide_random_parity_50_games():
    """50 lockstep games x 100 plies with per-ply legal-set equality — the
    reference harness's own depth (test_cython.py:87-123), run as ONE
    batched env against 50 oracles."""
    B, plies = 50, 100
    rng = random.Random(2024)
    oracles = [Position() for _ in range(B)]
    states = E.reset_batch_jit(B)
    step_b = E.v_step_jit
    finished = 0
    for ply in range(plies):
        legal = np.asarray(states.legal)
        done_env = np.asarray(states.done)
        winner_env = np.asarray(states.winner)
        acts = []
        for i, p in enumerate(oracles):
            done_o, win_o = p.result()
            assert bool(done_env[i]) == done_o, f"game {i} ply {ply}"
            if done_o:
                assert int(winner_env[i]) == win_o, f"game {i} ply {ply}"
                acts.append(0)  # ignored: env freezes finished games
                continue
            ora = p.legal_actions()
            env_set = set(np.nonzero(legal[i])[0].tolist())
            assert env_set == set(ora), f"game {i} ply {ply}"
            a = rng.choice(ora)
            p.apply(a)
            acts.append(a)
        states = step_b(states, jnp.asarray(acts, jnp.int32))
    finished = sum(1 for p in oracles if p.result()[0])
    # sanity: the harness actually exercised game endings
    assert finished >= 1
