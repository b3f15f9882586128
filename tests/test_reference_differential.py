"""Differential test: our oracle vs the upstream reference engine.

Runs only when the reference checkout is present (developer machines / CI
images that mount it). This is the outermost ring of the bit-exactness
contract: oracle == reference, and (in test_env_parity.py) JAX env == oracle.
Pattern after reference training/test_cython.py:87-123.
"""

import os
import random
import sys

import numpy as np
import pytest

REF = "/root/reference/training"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def test_oracle_matches_reference_on_random_games():
    sys.path.insert(0, REF)
    from game import XiangqiGame  # noqa: E402  (reference module)

    from xiangqi_alphazero_tpu.engine.oracle import Position

    rng = random.Random(1234)
    for g in range(10):
        ref, mine = XiangqiGame(), Position()
        for ply in range(120):
            ref_acts = sorted(ref.get_legal_actions())
            assert ref_acts == mine.legal_actions(), f"game {g} ply {ply}"
            assert (tuple(ref.is_game_over())) == (tuple(mine.result()))
            assert np.array_equal(ref.get_state_for_nn(), mine.features())
            done, _ = mine.result()
            if done:
                break
            a = rng.choice(ref_acts)
            ref.make_action(a)
            mine.apply(a)


def test_movegen_order():
    """search.movegen_precedence must reproduce the reference engine's
    get_legal_moves() ENUMERATION ORDER (not just the set): the reference
    MCTS builds its children dict in this order and resolves exact UCB /
    visit-count ties to the first entry, so the batched search's packed
    tie-break key is pinned to it."""
    sys.path.insert(0, REF)
    from game import XiangqiGame  # noqa: E402  (reference module)

    from xiangqi_alphazero_tpu.search import movegen_precedence

    rng = random.Random(77)
    for g in range(6):
        ref = XiangqiGame()
        for ply in range(100):
            ref_acts = ref.get_legal_actions()  # enumeration order
            board = ref.board
            ours = sorted(
                ref_acts,
                key=lambda a: movegen_precedence(
                    a, abs(int(board[a // 90 // 9, (a // 90) % 9]))
                ),
            )
            assert ours == ref_acts, f"game {g} ply {ply}"
            done, _ = ref.is_game_over()
            if done or not ref_acts:
                break
            ref.make_action(rng.choice(ref_acts))
