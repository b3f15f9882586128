"""Parity tests for the fused Pallas legal-mask kernel and the per-piece
slot compaction.

Mirrors the reference's differential-test pattern (reference:
training/test_cython.py:87-123): the optimized implementation must produce
bit-identical results to the plain one on random reachable positions. The
kernel runs in Pallas interpreter mode here (CPU); the compiled TPU kernel
is exercised by bench/selfplay on hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiangqi_alphazero_tpu.engine import env as E
from xiangqi_alphazero_tpu.ops.legal_mask import legal_mask_pallas
from xiangqi_alphazero_tpu.search import mcts as M


def _random_positions(n_steps: int = 30, batch: int = 8):
    """Roll random games with the XLA env; return stacked (boards, sides)."""
    rng = np.random.default_rng(7)
    s = jax.jit(E.reset_batch, static_argnums=0)(batch)
    step = jax.jit(E.v_step)
    boards, sides = [np.asarray(s.board)], [np.asarray(s.side)]
    for _ in range(n_steps):
        legal = np.asarray(s.legal)
        acts = [
            rng.choice(np.nonzero(row)[0]) if row.any() else 0 for row in legal
        ]
        s = step(s, jnp.asarray(acts, jnp.int32))
        boards.append(np.asarray(s.board))
        sides.append(np.asarray(s.side))
    return np.concatenate(boards), np.concatenate(sides)


@pytest.fixture(scope="module")
def positions():
    return _random_positions()


def test_pallas_kernel_matches_xla(positions):
    boards, sides = positions
    ref = np.asarray(
        jax.jit(jax.vmap(E.legal_mask))(jnp.asarray(boards), jnp.asarray(sides))
    )
    got = np.asarray(
        legal_mask_pallas(jnp.asarray(boards), jnp.asarray(sides), interpret=True)
    )
    assert np.array_equal(ref, got)


def test_slot_compaction_matches_topk(positions):
    """_legal_slots_priors must cover exactly the legal set, with exact f32
    policy values, within the per-piece budgets. Slot values are PACKED
    (movegen precedence above the action, see mcts._PACK): the packed prefix
    must equal the host-side movegen_precedence key, so that ascending
    packed order is the reference engine's enumeration order."""
    boards, sides = positions
    b = jnp.asarray(boards)
    s = jnp.asarray(sides)
    legal = jax.jit(jax.vmap(E.legal_mask))(b, s)
    probs = jax.random.uniform(jax.random.key(0), (boards.shape[0], 8100))

    packed, valid, prio = jax.jit(
        lambda *a: M._legal_slots_priors(*a, 128)
    )(b, s, legal, probs)
    packed, valid, prio = map(np.asarray, (packed, valid, prio))
    legal_np = np.asarray(legal)
    probs_np = np.asarray(probs)

    for i in range(boards.shape[0]):
        want = set(np.nonzero(legal_np[i])[0].tolist())
        got_packed = packed[i][valid[i]]
        got = got_packed % M._PACK
        assert len(got) == len(set(got.tolist())), "duplicate slot actions"
        assert set(got.tolist()) == want
        assert np.all(packed[i][~valid[i]] == -1)
        np.testing.assert_array_equal(prio[i][valid[i]], probs_np[i][got])
        for pk, a in zip(got_packed.tolist(), got.tolist()):
            kind = abs(int(boards[i][a // 90]))
            assert pk // M._PACK == M.movegen_precedence(a, kind)
