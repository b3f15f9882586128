"""Vectorized pure-JAX Xiangqi environment.

The TPU-native replacement for the reference's Cython hot path
(reference: training/cython_engine/game_core.pyx) and the Python engine
around it (reference: training/game.py). One jit/vmap program computes the
full 8100-action legal mask for thousands of boards in lockstep:

- pseudo-legal moves come from ONE ``occupancy @ BLOCK`` matmul (geometric
  blocker counts for rays / elephant eyes / horse legs) plus static gathers
  of per-piece geometry tables — MXU-friendly, no data-dependent control
  flow;
- the king-safety filter ("is my king attacked after this move?") is
  evaluated incrementally for all 8100 candidate moves at once: enemy
  attackers are compacted into fixed slots (2 rooks, 2 cannons, 2 horses,
  5 pawns, 1 king) via top_k, and each slot's attack condition is expressed
  through precomputed between/leg tables updated by the move's (from, to)
  deltas — replacing the reference's O(moves) make/unmake loop
  (reference: training/game.py:441-490);
- king moves are handled by a 9-square palace safety sub-pass.

Bit-exactness contract: ``legal_mask`` must equal the Python oracle's legal
set on every reachable position (tests/test_env_parity.py), mirroring the
reference's own Python-vs-Cython differential harness
(reference: training/test_cython.py:87-123).

State is a flax.struct pytree; ``step`` applies a move, maintains the
12-slot pre-move snapshot ring for the repetition rule, and evaluates the
terminal conditions in the reference's exact priority order
(reference: training/game.py:565-616). Finished games freeze (stepping a
done state is a no-op) so batches of games at different plies stay in
lockstep.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from . import tables as _tables

ROWS, COLS, NSQ = 10, 9, 90
ACTION_SPACE = NSQ * NSQ
HIST_LEN = 12  # repetition window (reference: game.py:607-614)


@functools.lru_cache(maxsize=1)
def _T() -> dict:
    """Table dict as jnp device constants (baked into jit programs).

    Materialized eagerly at module import (see bottom of file) — building
    device arrays inside a jit trace would leak tracers into the cache.
    """
    t = _tables.tables()
    out = {}
    for k, v in t.items():
        out[k] = jnp.asarray(v)
    out["BLOCK_F"] = jnp.asarray(t["BLOCK"].astype(np.float32))
    return out


@struct.dataclass
class EnvState:
    board: jax.Array   # int8[90]
    side: jax.Array    # int8, +1 red to move / -1 black
    ply: jax.Array     # int32, move_count
    quiet: jax.Array   # int32, consecutive non-capture plies
    hist: jax.Array    # int8[HIST_LEN, 90], pre-move snapshot ring
    done: jax.Array    # bool
    winner: jax.Array  # int8: 1 red, -1 black, 0 draw (valid when done)
    legal: jax.Array   # bool[8100], legal mask for `side`


# --------------------------------------------------------------------------
# Legal move mask (single board; vmap for batches)
# --------------------------------------------------------------------------

def legal_mask(board: jax.Array, side: jax.Array) -> jax.Array:
    """bool[8100] legal-action mask for ``side`` on ``board`` (int8[90])."""
    T = _T()
    FR, TO = T["FR"], T["TO"]
    s32 = side.astype(jnp.int32)
    si = (s32 < 0).astype(jnp.int32)   # 0 red / 1 black
    ei = 1 - si

    occ = board != 0
    occ_i = occ.astype(jnp.int32)
    blockcnt = jnp.dot(
        occ.astype(jnp.float32), T["BLOCK_F"], preferred_element_type=jnp.float32
    )
    b0 = blockcnt < 0.5
    b1 = (blockcnt > 0.5) & (blockcnt < 1.5)

    pf = board[FR].astype(jnp.int32)
    pt = board[TO].astype(jnp.int32)
    spf = pf * s32   # own piece kinds positive at the from-square
    spt = pt * s32
    own_t = spt > 0
    enemy_t = spt < 0
    empty_t = pt == 0
    occ_t = pt != 0

    pseudo = (
        ((spf == 1) & T["KING_A"][si])
        | ((spf == 2) & T["ADV_A"][si])
        | ((spf == 3) & T["ELE_A"][si] & b0)
        | ((spf == 4) & T["HORSE_A"] & b0)
        | ((spf == 5) & T["ALIGNED_A"] & b0)
        | ((spf == 7) & T["PAWN_A"][si])
    ) & ~own_t
    pseudo = pseudo | (
        (spf == 6) & T["ALIGNED_A"] & ((b0 & empty_t) | (b1 & enemy_t))
    )

    # ---- king-safety filter -------------------------------------------
    is_my_king = board == side
    has_king = jnp.any(is_my_king)
    k = jnp.argmax(is_my_king).astype(jnp.int32)

    ecode = lambda kind: (-side * kind).astype(board.dtype)  # noqa: E731

    def find_slots(code: jax.Array, n: int):
        v, idx = jax.lax.top_k((board == code).astype(jnp.float32), n)
        return idx.astype(jnp.int32), v > 0.5

    rk_i, rk_v = find_slots(ecode(5), 2)
    cn_i, cn_v = find_slots(ecode(6), 2)
    hs_i, hs_v = find_slots(ecode(4), 2)
    pw_i, pw_v = find_slots(ecode(7), 5)
    is_e_king = board == ecode(1)
    ek = jnp.argmax(is_e_king).astype(jnp.int32)
    ek_v = jnp.any(is_e_king)

    # Generic path: the king stays at k; move is (FR[a], TO[a]).
    def ray_threat(s, valid, want):
        btwrow = T["BTW"][s, k].astype(jnp.int32)      # [90]
        cnt0 = jnp.dot(btwrow, occ_i)
        cntp = cnt0 - btwrow[FR] + jnp.where(occ_t, 0, btwrow[TO])
        return valid & T["ALIGNED_SQ"][s, k] & (TO != s) & (cntp == want)

    def horse_threat(s, valid):
        geom = T["HORSE_PAIR"][s, k]
        leg = T["KLEG"][s, k]
        loccp = jnp.where(TO == leg, 1, jnp.where(FR == leg, 0, occ_i[leg]))
        return valid & geom & (TO != s) & (loccp == 0)

    def pawn_threat(s, valid):
        return valid & T["PAWN_ATK"][ei, s, k] & (TO != s)

    unsafe = ray_threat(ek, ek_v, 0)  # enemy king ray == flying general
    for i in range(2):
        unsafe |= ray_threat(rk_i[i], rk_v[i], 0)
        unsafe |= ray_threat(cn_i[i], cn_v[i], 1)
        unsafe |= horse_threat(hs_i[i], hs_v[i])
    for i in range(5):
        unsafe |= pawn_threat(pw_i[i], pw_v[i])

    # King-move path: 9 candidate palace destinations j, king vacates k.
    pal = T["PALACE_SQ"][si]  # int32[9]

    def ray_threat_pal(s, valid, want):
        rows = T["BTW"][s][pal].astype(jnp.int32)  # [9, 90] between(s, j, .)
        cnt0 = rows @ occ_i
        cntp = cnt0 - rows[:, k]                   # king left k
        return valid & T["ALIGNED_SQ"][s][pal] & (pal != s) & (cntp == want)

    def horse_threat_pal(s, valid):
        geom = T["HORSE_PAIR"][s][pal]
        leg = T["KLEG"][s][pal]                    # [9]
        loccp = jnp.where(leg == pal, 1, jnp.where(leg == k, 0, occ_i[leg]))
        return valid & geom & (pal != s) & (loccp == 0)

    def pawn_threat_pal(s, valid):
        return valid & T["PAWN_ATK"][ei, s][pal] & (pal != s)

    unsafe_pal = ray_threat_pal(ek, ek_v, 0)
    for i in range(2):
        unsafe_pal |= ray_threat_pal(rk_i[i], rk_v[i], 0)
        unsafe_pal |= ray_threat_pal(cn_i[i], cn_v[i], 1)
        unsafe_pal |= horse_threat_pal(hs_i[i], hs_v[i])
    for i in range(5):
        unsafe_pal |= pawn_threat_pal(pw_i[i], pw_v[i])

    unsafe_sq = jnp.zeros(NSQ, bool).at[pal].set(unsafe_pal)
    king_unsafe = unsafe_sq[TO]

    safe = jnp.where(FR == k, ~king_unsafe, ~unsafe)
    return pseudo & safe & has_king


def is_in_check(board: jax.Array, side: jax.Array) -> jax.Array:
    """Is ``side``'s king attacked? (reference: game.py:652-661)."""
    T = _T()
    s32 = side.astype(jnp.int32)
    ei = (s32 > 0).astype(jnp.int32)  # attacker side index
    occ_i = (board != 0).astype(jnp.int32)
    is_my_king = board == side
    k = jnp.argmax(is_my_king).astype(jnp.int32)

    ecode = lambda kind: (-side * kind).astype(board.dtype)  # noqa: E731

    def ray(s, valid, want):
        btwrow = T["BTW"][s, k].astype(jnp.int32)
        return valid & T["ALIGNED_SQ"][s, k] & (jnp.dot(btwrow, occ_i) == want)

    def slots(code, n):
        v, idx = jax.lax.top_k((board == code).astype(jnp.float32), n)
        return idx.astype(jnp.int32), v > 0.5

    rk_i, rk_v = slots(ecode(5), 2)
    cn_i, cn_v = slots(ecode(6), 2)
    hs_i, hs_v = slots(ecode(4), 2)
    pw_i, pw_v = slots(ecode(7), 5)
    is_ek = board == ecode(1)
    ek, ek_v = jnp.argmax(is_ek).astype(jnp.int32), jnp.any(is_ek)

    att = ray(ek, ek_v, 0)
    for i in range(2):
        att |= ray(rk_i[i], rk_v[i], 0)
        att |= ray(cn_i[i], cn_v[i], 1)
        att |= (
            hs_v[i]
            & T["HORSE_PAIR"][hs_i[i], k]
            & (occ_i[T["KLEG"][hs_i[i], k]] == 0)
        )
    for i in range(5):
        att |= pw_v[i] & T["PAWN_ATK"][ei, pw_i[i], k]
    return att | ~jnp.any(is_my_king)


# --------------------------------------------------------------------------
# Features / material / mirror
# --------------------------------------------------------------------------

def features(board: jax.Array, side: jax.Array) -> jax.Array:
    """NN planes NHWC float32[10, 9, 15] (reference: game.py:618-640):
    0-6 own pieces, 7-13 opponent, 14 = 1.0 iff red to move."""
    b = board.reshape(ROWS, COLS)
    kinds = (jnp.arange(1, 8, dtype=jnp.int32) * side.astype(jnp.int32)).astype(
        board.dtype
    )
    own = b[..., None] == kinds
    opp = b[..., None] == (-kinds)
    turn = jnp.broadcast_to(side > 0, (ROWS, COLS))[..., None]
    return jnp.concatenate([own, opp, turn], axis=-1).astype(jnp.float32)


def material(board: jax.Array, side: jax.Array) -> jax.Array:
    """Material score for ``side`` (reference: game.py:552-563, 74)."""
    T = _T()
    v = T["PIECE_VAL"][jnp.abs(board.astype(jnp.int32))]
    mine = board.astype(jnp.int32) * side.astype(jnp.int32) > 0
    return jnp.sum(jnp.where(mine, v, 0))


def mirror_board(board: jax.Array) -> jax.Array:
    return board[_T()["MIRROR_SQ"]]


def mirror_actions(actions: jax.Array) -> jax.Array:
    return _T()["MIRROR_ACT"][actions]


# --------------------------------------------------------------------------
# Game lifecycle
# --------------------------------------------------------------------------

def reset() -> EnvState:
    T = _T()
    board = T["INIT_BOARD"]
    side = jnp.int8(1)
    return EnvState(
        board=board,
        side=side,
        ply=jnp.int32(0),
        quiet=jnp.int32(0),
        hist=jnp.zeros((HIST_LEN, NSQ), jnp.int8),
        done=jnp.bool_(False),
        winner=jnp.int8(0),
        legal=legal_mask(board, side),
    )


def _terminal(
    board: jax.Array,
    side: jax.Array,
    ply: jax.Array,
    quiet: jax.Array,
    hist: jax.Array,
    legal: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """(done, winner) in the reference's exact priority order
    (reference: game.py:565-616). ``side`` is the player now to move."""
    r_king = jnp.any(board == 1)
    b_king = jnp.any(board == -1)
    no_moves = ~jnp.any(legal)

    diff = material(board, jnp.int8(1)) - material(board, jnp.int8(-1))
    adjud = jnp.where(diff > 30, 1, jnp.where(diff < -30, -1, 0)).astype(jnp.int8)

    slot = jnp.arange(HIST_LEN, dtype=jnp.int32)
    valid = slot < ply
    same = jnp.all(hist == board[None, :], axis=1) & valid
    rep3 = (ply >= 6) & (jnp.sum(same.astype(jnp.int32)) >= 3)

    conds = jnp.stack(
        [~r_king, ~b_king, no_moves, quiet >= 120, ply >= 200, rep3]
    )
    winners = jnp.stack(
        [
            jnp.int8(-1),
            jnp.int8(1),
            (-side).astype(jnp.int8),
            jnp.int8(0),
            adjud,
            jnp.int8(0),
        ]
    )
    done = jnp.any(conds)
    first = jnp.argmax(conds)
    return done, winners[first]


def step_core(state: EnvState, action: jax.Array) -> EnvState:
    """Board/counter/history update ONLY — ``legal``/``done``/``winner`` are
    left STALE. This is the cheap half of ``step`` for callers that already
    know the resulting position's status (the MCTS descent re-walks known
    interior nodes whose terminality is stored in the tree) or will call
    ``evaluate_state`` at the end. Does NOT freeze finished games."""
    T = _T()
    a = action.astype(jnp.int32)
    f, t = T["FR"][a], T["TO"][a]
    piece = state.board[f]
    captured = state.board[t]

    hist = state.hist.at[state.ply % HIST_LEN].set(state.board)
    board = state.board.at[t].set(piece).at[f].set(jnp.int8(0))
    quiet = jnp.where(captured != 0, 0, state.quiet + 1).astype(jnp.int32)
    return state.replace(
        board=board,
        side=(-state.side).astype(jnp.int8),
        ply=state.ply + 1,
        quiet=quiet,
        hist=hist,
    )


def evaluate_state(state: EnvState) -> EnvState:
    """Fill in ``legal``/``done``/``winner`` from the core fields (the
    expensive half of ``step``)."""
    legal = legal_mask(state.board, state.side)
    done, winner = _terminal(
        state.board, state.side, state.ply, state.quiet, state.hist, legal
    )
    return state.replace(legal=legal, done=done, winner=winner)


def step(state: EnvState, action: jax.Array) -> EnvState:
    """Apply ``action`` (int32 in [0, 8100)). No-op on finished games."""
    new = evaluate_state(step_core(state, action))
    return jax.tree.map(
        lambda n, o: jnp.where(state.done, o, n), new, state
    )


# --------------------------------------------------------------------------
# Batched API
# --------------------------------------------------------------------------

def reset_batch(batch: int) -> EnvState:
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (batch,) + x.shape), reset()
    )

v_step = jax.vmap(step)
v_legal_mask = jax.vmap(legal_mask)
v_features = jax.vmap(features)
v_material = jax.vmap(material, in_axes=(0, None))
v_is_in_check = jax.vmap(is_in_check)

# Jitted singles for host-side callers (tests, serving). Never call the raw
# functions eagerly in a loop — op-by-op dispatch compiles each primitive.
reset_jit = jax.jit(reset)
step_jit = jax.jit(step)
legal_mask_jit = jax.jit(legal_mask)
features_jit = jax.jit(features)
material_jit = jax.jit(material)
is_in_check_jit = jax.jit(is_in_check)
reset_batch_jit = jax.jit(reset_batch, static_argnums=0)
v_step_jit = jax.jit(v_step)


@jax.jit
def _build_state(b, s, ply, quiet, h):
    legal = legal_mask(b, s)
    done, winner = _terminal(b, s, ply, quiet, h, legal)
    return EnvState(
        board=b, side=s, ply=ply, quiet=quiet, hist=h,
        done=done, winner=winner, legal=legal,
    )


def state_from_numpy(board: np.ndarray, side: int, ply: int = 0, quiet: int = 0,
                     hist: np.ndarray | None = None) -> EnvState:
    """Build an EnvState from host data (for tests / serving)."""
    b = jnp.asarray(board, jnp.int8).reshape(NSQ)
    h = (
        jnp.zeros((HIST_LEN, NSQ), jnp.int8)
        if hist is None
        else jnp.asarray(hist, jnp.int8)
    )
    return _build_state(b, jnp.int8(side), jnp.int32(ply), jnp.int32(quiet), h)


# Materialize table constants at import time (outside any trace).
_T()
