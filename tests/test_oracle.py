"""Golden-position and property tests for the pure-Python oracle.

Ports the reference's test strategy (SURVEY.md §4): golden positions from
training/test_v3.py:106-203 and rollout invariants from test_v3.py:16-103.
"""

import random

import numpy as np
import pytest

from xiangqi_alphazero_tpu.engine.oracle import (
    ACTION_SPACE,
    COLS,
    NSQ,
    Position,
    decode_action,
    encode_action,
)


def _empty_position(side=1):
    p = Position()
    p.board = [0] * NSQ
    p.side = side
    return p


def _put(p, r, c, piece):
    p.board[r * COLS + c] = piece


def test_initial_position_44_moves():
    # Canonical golden value (reference: test_v3.py:115-120).
    p = Position()
    assert len(p.legal_actions()) == 44


def test_action_roundtrip():
    for a in random.Random(0).sample(range(ACTION_SPACE), 500):
        fr, fc, tr, tc = decode_action(a)
        assert encode_action(fr, fc, tr, tc) == a


def test_flying_general_illegal():
    # Kings on the same file with nothing between: moving a blocker away
    # must be illegal; the facing itself is a check.
    p = _empty_position()
    _put(p, 0, 4, 1)    # red king e0
    _put(p, 9, 4, -1)   # black king e9
    _put(p, 5, 4, 5)    # red rook between them
    p.side = 1
    # rook can slide along the file but may never leave it
    for a in p.legal_actions():
        fr, fc, tr, tc = decode_action(a)
        if (fr, fc) == (5, 4):
            assert tc == 4, "rook move exposing flying general must be illegal"


def test_rook_check_must_be_answered():
    p = _empty_position()
    _put(p, 0, 4, 1)     # red king
    _put(p, 9, 3, -1)    # black king (off-file)
    _put(p, 5, 4, -5)    # black rook giving check down the e-file
    p.side = 1
    moves = p.legal_moves()
    assert moves, "king must have escape squares"
    for fr, fc, tr, tc in moves:
        q = p.copy()
        q.apply(encode_action(fr, fc, tr, tc))
        assert not q.in_check(1)


def test_horse_leg_block():
    p = _empty_position()
    _put(p, 0, 4, 1)
    _put(p, 9, 4, -1)
    _put(p, 4, 4, 4)    # red horse
    _put(p, 5, 4, 7)    # own pawn blocks the vertical-forward legs
    p.side = 1
    dests = {(tr, tc) for fr, fc, tr, tc in p.legal_moves() if (fr, fc) == (4, 4)}
    # legs at (5,4) blocked -> (6,3) and (6,5) unreachable
    assert (6, 3) not in dests and (6, 5) not in dests
    assert (2, 3) in dests and (2, 5) in dests


def test_cannon_needs_exactly_one_screen():
    p = _empty_position()
    _put(p, 0, 4, 1)
    _put(p, 9, 3, -1)
    _put(p, 2, 0, 6)     # red cannon a2
    _put(p, 5, 0, 7)     # screen
    _put(p, 8, 0, -5)    # black rook target
    p.side = 1
    dests = {(tr, tc) for fr, fc, tr, tc in p.legal_moves() if (fr, fc) == (2, 0)}
    assert (8, 0) in dests            # capture over one screen
    assert (5, 0) not in dests        # cannot capture the screen itself
    assert (3, 0) in dests and (4, 0) in dests  # quiet slides below screen
    assert (6, 0) not in dests        # cannot slide past the screen


def test_cannon_check_detection():
    p = _empty_position()
    _put(p, 0, 4, 1)
    _put(p, 9, 4, -1)
    _put(p, 5, 4, 7)     # platform (red pawn, anyone's piece works)
    _put(p, 8, 4, -6)    # black cannon over the platform -> check on red king
    assert p.in_check(1)
    _put(p, 3, 4, 7)     # second platform breaks the cannon attack
    assert not p.in_check(1)


def test_elephant_river_and_eye():
    p = _empty_position()
    _put(p, 0, 3, 1)
    _put(p, 9, 4, -1)
    _put(p, 2, 2, 3)     # red elephant
    p.side = 1
    dests = {(tr, tc) for fr, fc, tr, tc in p.legal_moves() if (fr, fc) == (2, 2)}
    assert dests == {(0, 0), (0, 4), (4, 0), (4, 4)}
    _put(p, 3, 3, 7)     # block one eye
    p._legal_cache = None
    dests = {(tr, tc) for fr, fc, tr, tc in p.legal_moves() if (fr, fc) == (2, 2)}
    assert (4, 4) not in dests


def test_pawn_river_rules():
    p = _empty_position()
    _put(p, 0, 3, 1)
    _put(p, 9, 4, -1)
    _put(p, 4, 2, 7)     # red pawn before the river
    _put(p, 5, 6, 7)     # red pawn across the river
    p.side = 1
    dests_pre = {(tr, tc) for fr, fc, tr, tc in p.legal_moves() if (fr, fc) == (4, 2)}
    dests_post = {(tr, tc) for fr, fc, tr, tc in p.legal_moves() if (fr, fc) == (5, 6)}
    assert dests_pre == {(5, 2)}
    assert dests_post == {(6, 6), (5, 5), (5, 7)}


def test_terminal_no_legal_moves_loses():
    # Stalemate/checkmate: the side to move with no legal moves loses
    # (reference: game.py:584-588).
    p = _empty_position()
    _put(p, 0, 3, 1)     # red king cornered at d0
    _put(p, 9, 4, -1)
    _put(p, 1, 5, -5)    # black rooks boxing it in
    _put(p, 2, 3, -5)
    p.side = 1
    if not p.legal_actions():
        done, winner = p.result()
        assert done and winner == -1


def test_repetition_draw():
    p = Position()
    # Shuffle both horses back and forth: each position recurs.
    seq = [
        encode_action(0, 1, 2, 2), encode_action(9, 1, 7, 2),
        encode_action(2, 2, 0, 1), encode_action(7, 2, 9, 1),
    ] * 3
    done = False
    for a in seq:
        assert a in p.legal_actions()
        p.apply(a)
        done, winner = p.result()
        if done:
            break
    assert done and winner == 0


def test_quiet_120_draw_counter():
    p = Position()
    assert p.quiet == 0
    p.apply(encode_action(0, 1, 2, 2))
    assert p.quiet == 1
    p.quiet = 120
    done, winner = p.result()
    assert done and winner == 0


def test_material_scores():
    p = Position()
    # 2*20 + 2*20 + 2*40 + 2*90 + 2*45 + 5*10 = 480 per side, king = 0
    assert p.material(1) == 480
    assert p.material(-1) == 480


def test_features_shape_and_perspective():
    p = Position()
    f = p.features()
    assert f.shape == (15, 10, 9)
    assert f[14].min() == 1.0          # red to move
    assert f[0].sum() == 1             # one own king
    p.apply(p.legal_actions()[0])
    f2 = p.features()
    assert f2[14].max() == 0.0         # black to move
    # own planes now hold black pieces
    assert f2[0, 9, 4] == 1.0


@pytest.mark.parametrize("seed", range(4))
def test_random_rollout_invariants(seed):
    """50-games-worth of invariants compressed: legality, cache, counters
    (reference: test_v3.py:16-103)."""
    rng = random.Random(seed)
    p = Position()
    for _ in range(120):
        acts = p.legal_actions()
        assert acts == p.legal_actions()  # cache determinism
        done, winner = p.result()
        if done:
            assert winner in (1, -1, 0)
            break
        assert acts, "non-terminal position must have legal moves"
        assert len(acts) <= 119, "action width bound for the batched MCTS"
        a = rng.choice(acts)
        fr, fc, tr, tc = decode_action(a)
        assert p.at(fr, fc) != 0
        assert (p.at(fr, fc) > 0) == (p.side > 0)
        before_ply = p.ply
        p.apply(a)
        assert p.ply == before_ply + 1
        assert p.material(1) >= 0 and p.material(-1) >= 0
