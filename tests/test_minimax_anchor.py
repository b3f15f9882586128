"""Native minimax anchor opponent (engine/native xq_minimax_move).

The anchor must (a) always produce oracle-legal moves, (b) implement the
reference web AI's greedy-material semantics at depth 0 (reference:
web/client/src/lib/xiangqi-engine.ts:292-357; our JS twin:
serve/static/engine.js minimaxMove), and (c) be deterministic under a
fixed seed so anchor matches are reproducible."""

import random

import numpy as np
import pytest

from xiangqi_alphazero_tpu.engine import native
from xiangqi_alphazero_tpu.engine.oracle import Position, encode_action

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native core unavailable (no g++?)"
)


def test_legal_on_initial_position_all_depths():
    p = Position()
    legal = set(p.legal_actions())
    for side in (1, -1):
        q = Position()
        if side == -1:
            q.apply(q.legal_actions()[0])
            legal_b = set(q.legal_actions())
        for depth in range(4):
            if side == 1:
                a = native.minimax_move(p.board_array(), 1, depth, seed=3)
                assert a in legal
            else:
                a = native.minimax_move(q.board_array(), -1, depth, seed=3)
                assert a in legal_b


def test_moves_stay_legal_along_random_playouts():
    rng = random.Random(5)
    p = Position()
    for ply in range(80):
        done, _ = p.result()
        if done:
            break
        legal = p.legal_actions()
        a = native.minimax_move(p.board_array(), p.side, 1, seed=ply + 1)
        assert a in legal
        # advance with a RANDOM legal move so the line stays diverse
        p.apply(rng.choice(legal))


def test_depth0_takes_the_biggest_hanging_piece():
    # bare-bones board: red rook on (4,4) can take a black horse (40) at
    # (4,0) or a black pawn (10) at (4,8); kings on DIFFERENT files so the
    # rook leaving file 4 cannot trigger flying-general
    b = np.zeros(90, np.int8)
    b[3] = 1                                       # red king (0,3)
    b[9 * 9 + 5] = -1                              # black king (9,5)
    b[9 * 4 + 4] = 5                               # red rook (4,4)
    b[9 * 4 + 0] = -4                              # black horse (4,0)
    b[9 * 4 + 8] = -7                              # black pawn (4,8)
    a = native.minimax_move(b, 1, 0, seed=9)
    assert a == encode_action(4, 4, 4, 0)  # takes the horse, not the pawn


def test_depth2_declines_a_defended_pawn():
    # red rook (4,4); black pawn (4,6) defended by a black rook (8,6);
    # depth 2 sees the recapture (-90+10 net) and must decline, depth 0
    # takes it (it is the only capture). Kings on different files.
    b = np.zeros(90, np.int8)
    b[3] = 1                                       # red king (0,3)
    b[9 * 9 + 5] = -1                              # black king (9,5)
    b[9 * 4 + 4] = 5                               # red rook (4,4)
    b[9 * 4 + 6] = -7                              # black pawn (4,6)
    b[9 * 8 + 6] = -5                              # black rook (8,6) defends
    greedy = native.minimax_move(b, 1, 0, seed=9)
    assert greedy == encode_action(4, 4, 4, 6)
    a = native.minimax_move(b, 1, 2, seed=9)
    assert a != encode_action(4, 4, 4, 6)


def test_seed_determinism():
    p = Position()
    moves_a = [native.minimax_move(p.board_array(), 1, 2, seed=s)
               for s in (1, 2, 3)]
    moves_b = [native.minimax_move(p.board_array(), 1, 2, seed=s)
               for s in (1, 2, 3)]
    assert moves_a == moves_b


class _StubPred:
    """Minimal Predictor stand-in for play_match: 1-visit 'search' that
    returns each position's first legal action (movegen order)."""

    def search_batch(self, positions, pad_to=None):
        out = []
        for p in positions:
            a = p.legal_actions()[0]
            out.append((np.asarray([a], np.int32),
                        np.asarray([1], np.int32),
                        np.asarray([0], np.int32)))
        return out


def _play(depth, epsilon, games=2):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "minimax_anchor",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "minimax_anchor.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.play_match(_StubPred(), depth, games, epsilon=epsilon)


def test_play_match_epsilon_blunder_ladder_runs_and_is_deterministic():
    # epsilon=1.0: minimax side is a pure random mover; the match must
    # complete under oracle rules and be reproducible (per-move seeds)
    r1 = _play(depth=0, epsilon=1.0)
    r2 = _play(depth=0, epsilon=1.0)
    assert r1 == r2
    assert r1["net_wins"] + r1["draws"] + r1["net_losses"] == 2
    assert 0.0 <= r1["score"] <= 1.0
    # epsilon=0 is the pure-minimax path (unchanged protocol)
    r0 = _play(depth=0, epsilon=0.0)
    assert r0["net_wins"] + r0["draws"] + r0["net_losses"] == 2
