"""Native C++ core differential tests — the exact harness shape the
reference uses for its Cython engine (training/test_cython.py): legal-move
set equality on the initial position and along random playouts, plus check
detection parity, against the pure-Python oracle."""

import random
import time

import numpy as np
import pytest

from xiangqi_alphazero_tpu.engine import native
from xiangqi_alphazero_tpu.engine.oracle import Position, use_python_rules

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native core unavailable (no g++?)"
)


@pytest.fixture(autouse=True)
def _force_python_oracle():
    # the oracle side of the diff must be the pure-Python implementation
    use_python_rules(True)
    yield
    use_python_rules(False)


def test_initial_position():
    p = Position()
    acts = native.gen_legal(p.board_array(), 1)
    assert acts == p.legal_actions()
    assert len(acts) == 44


@pytest.mark.parametrize("seed", range(5))
def test_random_playout_differential(seed):
    rng = random.Random(seed)
    p = Position()
    for ply in range(120):
        py = p.legal_actions()
        cc = native.gen_legal(p.board_array(), p.side)
        assert cc == py, f"seed {seed} ply {ply}\n{p.render()}"
        assert native.has_legal(p.board_array(), p.side) == bool(py)
        for side in (1, -1):
            assert native.is_in_check(p.board_array(), side) == p.in_check(side)
            k = p.find_king(side)
            assert native.find_king(p.board_array(), side) == k
        done, _ = p.result()
        if done:
            break
        p.apply(rng.choice(py))


def test_native_speedup():
    """The native core must beat pure-Python movegen comfortably
    (reference claims ~110x for Cython, README.md:59-63)."""
    p = Position()
    board = p.board_array()

    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        native.gen_legal(board, 1)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(20):
        p._legal_cache = None
        p.legal_actions()
    t_py = (time.perf_counter() - t0) * (n / 20)

    assert t_native * 5 < t_py, (t_native, t_py)
