"""Batched array-based MCTS (AlphaZero PUCT) over the vectorized env.

TPU-native redesign of the reference's per-game Python object tree
(reference: training/mcts.py). The whole batch of games searches in lockstep:
each simulation descends every game's tree (vmapped, masked while_loop),
evaluates ALL leaves in ONE fused network call, then expands and backs up.
This deletes the reference's socket inference server — batching is
structural, not opportunistic (reference: training/inference_server.py,
GPU_INFERENCE_FIX_SUMMARY.md:73 measured a mean batch of 3.5; here the batch
is the full game count every simulation).

Memory layout, chosen from measured TPU gather/scatter economics (inside a
batched while_loop, scalar-per-lane and contiguous-row-per-lane dynamic
indexing is cheap; per-lane *vectors* of indices and per-batch scatters are
two orders of magnitude slower):

- Edge statistics (visit count N, value sum W) live at the PARENT row,
  plane-major as ``ew[B, 2, N, K]`` — the select loop reads one contiguous
  [K] row per plane per step, and the plane-major axis order matches the
  layout XLA's convolution emitter picks for the backup contraction (the
  stats-plane-minor order cost two whole-array layout copies per sim). W
  is the sum of backed-up values from the parent's perspective
  (reference: mcts.py:21-73).
- Node allocation is deterministic: simulation i can only ever create node
  i+1, so expansion writes are uniform dynamic-update-slices on axis 1 —
  never per-batch scatters. Rows written for games that revisited an
  existing leaf are garbage but unreachable (no child pointer installed).
- Backup records the descent path ((parent, slot) per step) and applies it
  as one dense one-hot contraction ``sum_d oh_n[d] x oh_k[d]`` added into
  ``ew`` — replacing a scatter-add loop along parent pointers.
- The descent carries only the env CORE fields (board/side/ply/quiet/hist);
  the wide ``legal`` mask and terminal verdict are computed once per
  simulation for the whole batch of leaves (engine.env.evaluate_batch, the
  fused Pallas kernel on TPU).

Semantics preserved exactly from the reference (training/mcts.py):
- PUCT select: Q(child) + c_puct * P * sqrt(N_parent) / (1 + N_child),
  Q = W/N, 0 when unvisited (mcts.py:43-58), c_puct default 1.5;
- root priors masked to legal actions and renormalized, uniform fallback
  when the legal mass is zero (mcts.py:176-188);
- Dirichlet(0.3) root noise mixed at 25% over the legal set (mcts.py:117-121);
- terminal leaf value +1.0 for ANY decisive result, 0.0 for draws — from the
  perspective of the player who moved into the node (mcts.py:138-140; this
  includes the reference's material-adjudication quirk, replicated
  deliberately);
- NN leaf value negated once before backup (mcts.py:150), signs alternate up
  the path (mcts.py:66-73), the root visit count increments each sim;
- pi extraction: visit counts ** (1/temperature), one-hot argmax at temp=0
  (mcts.py:190-206);
- tie-breaking: the reference's children dict preserves MOVE-GENERATION
  insertion order (mcts.py:177-188 builds priors by iterating
  get_legal_actions()), and both its strict-'>' UCB select (mcts.py:51-57)
  and its temp-0 ``max()`` (mcts.py:198) resolve exact ties to the FIRST
  child in that order: from-squares scanned row-major, then each piece's
  moves in its generator's direction order (game.py:297-424 ==
  game_core.pyx:262-486 — Python and Cython enumerate identically). This
  is NOT ascending action order (a rook's up-file moves precede its
  lower-numbered left-file targets). The batched tree reproduces it by
  storing each slot's action PACKED with its movegen precedence
  (``_pack_actions``) and breaking ties by the packed key; consumers see
  plain actions, ``SearchResult.order`` exposes the key.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..engine import env as E

ACTION_SPACE = E.ACTION_SPACE

# Inclusive upper-triangular [90, 90] ones: X @ _TRI_INCL90 = inclusive
# prefix sums along a 90-wide axis, one MXU pass (exact for the small
# integer counts used here). Host-side numpy; converted at trace time,
# where it constant-folds (no device constant is cached across traces).
_TRI_INCL90 = np.triu(np.ones((90, 90), np.float32))


class MCTSConfig(NamedTuple):
    num_simulations: int = 200
    c_puct: float = 1.5
    dirichlet_alpha: float = 0.3
    noise_frac: float = 0.25
    max_children: int = 128


@struct.dataclass
class Tree:
    """Per-game search tree, batched on the leading axis. Node i+1 is the
    node created by simulation i (or unreachable garbage if that simulation
    revisited an existing leaf). The node axis N may be smaller than the
    final simulation count mid-search: ``run_mcts`` grows it in stages (see
    ``_stage_plan``)."""

    expanded: jax.Array     # bool[B, N]
    terminal: jax.Array     # bool[B, N]
    term_value: jax.Array   # f32[B, N] (parent-perspective value at terminals)
    actions: jax.Array      # i32[B, N, K], -1 = empty slot
    child: jax.Array        # i32[B, N, K], 0 = not yet created
    priors: jax.Array       # f32[B, N, K]
    # Edge stats, plane-major: [:, 0] = visit counts, [:, 1] = value sums.
    # The [B, 2, N, K] axis order matches the layout XLA's convolution
    # emitter picks for the backup contraction output — with the stats
    # plane between B and N ([B, N, 2, K]), every simulation paid TWO
    # whole-array layout-conversion copies (~22% of standard move time).
    ew: jax.Array           # f32[B, 2, N, K]
    root_n: jax.Array       # i32[B]


class SearchResult(NamedTuple):
    actions: jax.Array   # i32[B, K] root actions (-1 pad)
    visits: jax.Array    # i32[B, K] root visit counts
    valid: jax.Array     # bool[B, K]
    root_value: jax.Array  # f32[B] mean root value (diagnostics)
    # movegen-precedence key per slot (packed (from, rank, action); -1 pad):
    # ascending order == the reference's child enumeration order. Greedy /
    # temp-0 consumers break visit-count ties by argmin over this key.
    order: jax.Array     # i32[B, K]


# ---------------------------------------------------------------------------


def _mask_normalize(p_slots: jax.Array, valid: jax.Array) -> jax.Array:
    """Priors over child slots: mask to legal, renormalize; uniform fallback
    when the legal probability mass is zero (reference: mcts.py:176-188)."""
    p = jnp.where(valid, p_slots, 0.0)
    psum = jnp.sum(p, axis=-1, keepdims=True)
    n_valid = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1)
    uniform = valid.astype(jnp.float32) / n_valid
    return jnp.where(psum > 0, p / jnp.where(psum > 0, psum, 1.0), uniform)


# Per-piece-instance slot layout: each of the side-to-move's <=16 pieces gets
# a fixed budget of destination slots bounding its legal-move count (rook and
# cannon <=17 on an otherwise empty board, horse 8, elephant/advisor/king 4,
# pawn 3; reference movegen: game.py:297-424). Total 123 <= K=128. This makes
# mask->slot compaction a chain of dense 90-wide ops and small one-hot
# matmuls — an 8100-wide top_k sort here cost 56% of all search device time,
# and the 8100-wide prior gather another 17%.
_SLOT_KINDS = (5, 5, 6, 6, 4, 4, 3, 3, 2, 2, 1, 7, 7, 7, 7, 7)
_SLOT_BUDGET = {5: 18, 6: 18, 4: 8, 3: 4, 2: 4, 1: 4, 7: 3}

# Movegen-precedence packing: slot values are stored as
#   packed = (from_sq * 64 + rank) * _PACK + action,   action = packed % _PACK
# where ``rank`` is the move's index within its piece's generator enumeration
# (game.py:297-424 == game_core.pyx:262-486; identical orders):
#   king           DIRECTIONS order up/down/left/right           rank 0..3
#   advisor        (-1,-1),(-1,1),(1,-1),(1,1)                   rank 0..3
#   elephant       (-2,-2),(-2,2),(2,-2),(2,2)                   rank 0..3
#   horse          KNIGHT_MOVES table order                      rank 0..7
#   rook/cannon    direction (up/down/left/right) x outward step rank d*16+s
#                  (a cannon capture sits past its screen, so its step is
#                  always larger than every slide in that direction)
#   pawn           forward, left, right                          rank 0..2
# Ascending packed order == the reference's enumeration order (from-squares
# row-major, ranks within a piece), because rank < 64 and action < _PACK.
# Max packed value = (89*64 + 57) * 8192 + 8099 < 2^31 (i32-safe).
_PACK = 8192


def _movegen_rank(kind, dr: jax.Array, dc: jax.Array) -> jax.Array:
    """Within-piece enumeration rank of a (dr, dc) displacement; ``kind`` is
    a static-or-array piece kind (1..7, reference numbering)."""
    i32 = jnp.int32
    dir4 = jnp.where(dc == 0, jnp.where(dr < 0, 0, 1),
                     jnp.where(dc < 0, 2, 3)).astype(i32)
    dist = jnp.maximum(jnp.abs(dr), jnp.abs(dc)).astype(i32)
    quad = (dr > 0).astype(i32) * 2 + (dc > 0).astype(i32)
    horse = jnp.where(jnp.abs(dr) == 2, 0, 4).astype(i32) + quad
    pawn = jnp.where(dc == 0, 0, jnp.where(dc < 0, 1, 2)).astype(i32)
    return jnp.where(
        kind == 1, dir4,
        jnp.where((kind == 2) | (kind == 3), quad,
                  jnp.where(kind == 4, horse,
                            jnp.where(kind == 7, pawn, dir4 * 16 + dist))),
    )


def unpack_actions(packed: jax.Array) -> jax.Array:
    """Packed slot values -> plain actions (-1 pads preserved)."""
    return jnp.where(packed >= 0, packed % _PACK, -1)


def movegen_precedence(action: int, kind: int) -> int:
    """Host-side (python ints) reference-order key for one action — the
    same (from, rank) prefix the device packing uses. Sorting a position's
    legal actions by this key reproduces the reference engine's
    get_legal_moves() enumeration order exactly (game.py:297-424,
    game_core.pyx:262-486; pinned by
    tests/test_reference_differential.py::test_movegen_order)."""
    f, t = divmod(int(action), 90)
    dr, dc = t // 9 - f // 9, t % 9 - f % 9
    if kind == 1:
        rank = {(-1, 0): 0, (1, 0): 1, (0, -1): 2, (0, 1): 3}[(dr, dc)]
    elif kind in (2, 3):
        rank = (dr > 0) * 2 + (dc > 0)
    elif kind == 4:
        rank = (0 if abs(dr) == 2 else 4) + (dr > 0) * 2 + (dc > 0)
    elif kind == 7:
        rank = 0 if dc == 0 else (1 if dc < 0 else 2)
    else:  # rook / cannon: direction order, then outward step
        d = 0 if (dc == 0 and dr < 0) else 1 if dc == 0 else 2 if dc < 0 else 3
        rank = d * 16 + max(abs(dr), abs(dc))
    return f * 64 + rank


def _legal_slots_priors(
    board: jax.Array, side: jax.Array, legal: jax.Array, probs: jax.Array,
    k: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compact legal mask + policy into per-piece slots.

    board int8[B, 90], side int8[B], legal bool[B, 8100], probs f32[B, 8100]
    -> (packed i32[B, K] (-1 pad; see _PACK — ``unpack_actions`` recovers
    the action, ascending packed order is the reference movegen order),
    valid bool[B, K], priors f32[B, K]).
    Slot priors are the exact f32 policy values at the slot's action (picked
    by one-hot contraction, not gather)."""
    budgets = [_SLOT_BUDGET[kind] for kind in _SLOT_KINDS]
    assert k >= sum(budgets)
    b = board.shape[0]
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    # The mask participates only in one-hot picks and prefix COUNTS (all
    # integer-valued, <= 90 < 2^8), so bf16 is exact here and halves the
    # [B, 90, 90] relayout + matmul-operand traffic. The POLICY rows stay
    # f32 end to end: slot priors must be the exact f32 policy values
    # (pinned by the exact visit-count parity vs the reference mirror).
    # Alternative bit-exact layouts for the [B, 90, 90] relayout (~4% of
    # standard move time) were A/B'd on chip at 1.000-1.003x and retired —
    # docs/PERF_NOTES.md round-4 notes, scripts/slots_ab.py history.
    m = legal.reshape(b, 90, 90).astype(bf16)
    pr3 = probs.reshape(b, 90, 90)

    # Piece instance one-hots, vectorized: rank every square among its own
    # side's squares holding the same piece kind (inclusive prefix count)
    # and match the rank against the slot row's instance index. The
    # previous form — 16 iterations of argmax-and-subtract over [B, 90] —
    # was 32 serialized latency-bound ops (~0.13 ms/sim at batch 1024); so
    # was jnp.cumsum for the prefix counts, which XLA lowers as a 90-step
    # scan along the minor axis (~0.12 ms/sim). Both are one small MXU
    # matmul against a constant triangular matrix instead; the counts are
    # small integers, so the bf16 operands are exact.
    own = board.astype(jnp.int32) * side.astype(jnp.int32)[:, None]
    sq_iota = jnp.arange(90, dtype=jnp.int32)
    kinds_v = jnp.asarray(_SLOT_KINDS, jnp.int32)           # [16]
    inst_l, seen = [], {}
    for kind in _SLOT_KINDS:
        inst_l.append(seen.get(kind, 0))
        seen[kind] = seen.get(kind, 0) + 1
    inst_v = jnp.asarray(inst_l, jnp.int32)                 # [16]
    tri_incl = jnp.asarray(_TRI_INCL90, bf16)               # U[f,t] = f <= t
    is_kind = own[:, None, :] == kinds_v[None, :, None]     # [B, 16, 90]
    rank_sq = jnp.einsum(                                   # inclusive count
        "bpf,ft->bpt", is_kind.astype(bf16), tri_incl,
        preferred_element_type=f32,
    )
    oh_b = jnp.where(
        is_kind & (rank_sq == (inst_v[None, :, None] + 1).astype(f32)),
        jnp.asarray(1.0, bf16), jnp.asarray(0.0, bf16),
    )                                                       # [B, 16, 90]
    oh_pieces = oh_b.astype(f32)
    f_p = jnp.einsum("bpf,f->bp", oh_pieces, sq_iota.astype(f32))

    m_rows = jnp.einsum(                                    # [B, 16, 90]
        "bpf,bft->bpt", oh_b, m, preferred_element_type=f32
    )
    p_rows = jnp.einsum("bpf,bft->bpt", oh_pieces, pr3)
    r = jnp.einsum(                                         # dest ranks
        "bpf,ft->bpt", m_rows.astype(bf16), tri_incl,
        preferred_element_type=f32,
    )
    cnt = r[:, :, -1]
    t_iota = jnp.arange(90, dtype=f32)

    # Rank->slot one-hots per BUDGET GROUP: the slot rows are ordered so
    # equal-budget piece kinds are contiguous (rooks+cannons 18, horses 8,
    # elephants/advisors/king 4, pawns 3), and within a group every row
    # keeps exactly its budget's slots — so the [B, rows, 90, J] one-hot
    # is built at each group's own J (123 slot-columns total instead of
    # 16 x 18 = 288) and assembly is a plain reshape per group.
    groups = []
    start = 0
    while start < len(budgets):
        end = start
        while end < len(budgets) and budgets[end] == budgets[start]:
            end += 1
        groups.append((start, end, budgets[start]))
        start = end

    acts_parts, valid_parts, prio_parts = [], [], []
    for lo, hi, j_g in groups:
        r_g = r[:, lo:hi]
        m_g = m_rows[:, lo:hi]
        j_iota = jnp.arange(j_g, dtype=f32)
        ohj = ((r_g[..., None] == (j_iota + 1.0)) & (m_g[..., None] > 0.5))
        ohj = ohj.astype(f32)                               # [B, g, 90, Jg]
        comp_t = jnp.einsum("bptj,t->bpj", ohj, t_iota)
        comp_p = jnp.einsum("bptj,bpt->bpj", ohj, p_rows[:, lo:hi])
        valid_g = j_iota[None, None] < cnt[:, lo:hi, None]
        # pack the movegen precedence above the action (tiny elementwise
        # VPU work on the [B, g, Jg] slot tensors; kinds static per row)
        fi = f_p[:, lo:hi, None].astype(jnp.int32)          # from square
        ti = comp_t.astype(jnp.int32)                       # to square
        dr, dc = ti // 9 - fi // 9, ti % 9 - fi % 9
        kindv = jnp.asarray(_SLOT_KINDS[lo:hi], jnp.int32)[None, :, None]
        rank = _movegen_rank(kindv, dr, dc)
        acts_g = (fi * 64 + rank) * _PACK + fi * 90 + ti
        n_g = hi - lo
        acts_parts.append(acts_g.reshape(b, n_g * j_g))
        valid_parts.append(valid_g.reshape(b, n_g * j_g))
        prio_parts.append(comp_p.reshape(b, n_g * j_g))

    acts = jnp.concatenate(acts_parts, axis=1)
    valid = jnp.concatenate(valid_parts, axis=1)
    prio = jnp.concatenate(prio_parts, axis=1)
    pad = k - acts.shape[1]
    if pad:
        acts = jnp.pad(acts, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
        prio = jnp.pad(prio, ((0, 0), (0, pad)))
    return jnp.where(valid, acts, -1), valid, prio


def init_tree(batch: int, cfg: MCTSConfig, num_nodes: int | None = None) -> Tree:
    n = cfg.num_simulations + 1 if num_nodes is None else num_nodes
    k = cfg.max_children
    return Tree(
        expanded=jnp.zeros((batch, n), bool),
        terminal=jnp.zeros((batch, n), bool),
        term_value=jnp.zeros((batch, n), jnp.float32),
        actions=jnp.full((batch, n, k), -1, jnp.int32),
        child=jnp.zeros((batch, n, k), jnp.int32),
        priors=jnp.zeros((batch, n, k), jnp.float32),
        ew=jnp.zeros((batch, 2, n, k), jnp.float32),
        root_n=jnp.zeros((batch,), jnp.int32),
    )


# Minimum simulation count for 2-stage / 4-stage node-budget growth, and
# minimum BATCH for staging at all — at small batches the whole ew array is
# tiny (serve searches one game), so extra segments only multiply compile
# time. Module-level so tests can force staging at tiny scales. The one
# production shape below the threshold — evaluate()'s half-batches of
# eval_games/2 = 32 at the tpu preset — was measured on-chip
# (scripts/eval_stage_probe.py, docs/PERF_NOTES.md negative results):
# force-staging it gains only 1.048x, so it deliberately stays unstaged.
_STAGE_AT_2, _STAGE_AT_4 = 64, 160
_STAGE_MIN_BATCH = 64


def _stage_plan(num_simulations: int, batch: int | None = None) -> list:
    """Segment the simulation loop so the tree's static node budget grows
    with the simulation index instead of sitting at its final size from
    sim 0.

    Simulation i can only reach nodes 0..i+1 at depth <= i+1, but the dense
    backup (one-hot contraction + full-array ew add, see Tree.ew) pays
    O(N x K) HBM traffic at the STATIC budget N every simulation — at 200
    sims that is 2 x 211 MB per sim from the first one. Re-running the same
    fori_loop body over a few segments with a growing per-segment budget
    (tree zero-padded between segments) cuts that traffic ~40% while every
    shape stays static INSIDE each segment, preserving the in-place
    conv+add fusion. (The per-sim alternatives — lax.switch tiered
    prefixes, lax.cond depth caps — measured SLOWER for exactly that
    fusion reason; see docs/PERF_NOTES.md negative results.)

    Returns [(lo, hi, n_nodes, max_depth)]: run sims [lo, hi) with node
    budget n_nodes and descent-path capacity max_depth. Invariants: n_nodes
    >= hi + 1 (sim i writes node row i+1) and max_depth >= hi + 2 (depth
    <= i+1 always; the cap can never bind, same as the unstaged code).
    """
    total = num_simulations
    if batch is None:  # late-bound so mutating the knobs works consistently
        batch = _STAGE_MIN_BATCH
    if batch < _STAGE_MIN_BATCH:
        stages = 1
    else:
        stages = 4 if total >= _STAGE_AT_4 else 2 if total >= _STAGE_AT_2 else 1
    plan, lo = [], 0
    for s in range(1, stages + 1):
        hi = -(-total * s // stages)
        if s == stages:
            n_seg = total + 1  # final segment: exact full budget
        else:
            n_seg = min(total + 1, ((hi + 1 + 7) // 8) * 8)
        plan.append((lo, hi, n_seg, n_seg + 1))
        lo = hi
    return plan


def _grow_tree(tree: Tree, n_new: int) -> Tree:
    """Zero-pad every node-indexed axis from the current budget to n_new.
    Padded rows are unreachable until a later simulation installs a child
    pointer, and that simulation fully overwrites its row first."""
    n_old = tree.expanded.shape[1]
    if n_new == n_old:
        return tree
    g = ((0, 0), (0, n_new - n_old))
    gk = g + ((0, 0),)
    return Tree(
        expanded=jnp.pad(tree.expanded, g),
        terminal=jnp.pad(tree.terminal, g),
        term_value=jnp.pad(tree.term_value, g),
        actions=jnp.pad(tree.actions, gk, constant_values=-1),
        child=jnp.pad(tree.child, gk),
        priors=jnp.pad(tree.priors, gk),
        ew=jnp.pad(tree.ew, ((0, 0),) + gk),
        root_n=tree.root_n,
    )


# --------------------------------------------------------------- descent ---

_MODE_CREATE, _MODE_REVISIT, _MODE_NOOP = 0, 1, 2


class _Core(NamedTuple):
    """Env core fields carried through descent — everything except the wide
    ``legal`` mask and the terminal verdict, which are evaluated once at the
    leaf for the whole batch."""

    board: jax.Array
    side: jax.Array
    ply: jax.Array
    quiet: jax.Array
    hist: jax.Array


def _core_step(c: _Core, action: jax.Array) -> _Core:
    """engine.env.step_core on the reduced carry (dense move application —
    see env.apply_move for the chained-scatter miscompile this avoids)."""
    a = action.astype(jnp.int32)
    # FR/TO are divmod-by-90 by construction (tables.py:68-69); arithmetic
    # beats two per-lane constant-table gathers per descent step (~12 us
    # each at batch 1024 — 2.7% of standard move time).
    f, t = a // E.NSQ, a % E.NSQ
    captured = c.board[t]
    hist = E.update_hist(c.hist, c.ply, c.board)
    board = E.apply_move(c.board, f, t)
    quiet = jnp.where(captured != 0, 0, c.quiet + 1).astype(jnp.int32)
    return _Core(
        board=board,
        side=(-c.side).astype(jnp.int8),
        ply=c.ply + 1,
        quiet=quiet,
        hist=hist,
    )


def _descend_one(tree: Tree, root: _Core, c_puct: float, max_depth: int):
    """Select down one game's tree to a leaf (vmapped over the batch).
    Returns (mode, sel_parent, sel_slot, leaf_node, core_leaf, path_node,
    path_slot, depth): path_node[d]/path_slot[d] is the edge taken at depth
    d (valid for d < depth)."""

    class Carry(NamedTuple):
        cur: jax.Array
        node_n: jax.Array
        core: _Core
        stop: jax.Array
        mode: jax.Array
        leaf: jax.Array
        depth: jax.Array
        path_node: jax.Array
        path_slot: jax.Array

    def cond(c: Carry):
        return ~c.stop

    def body(c: Carry) -> Carry:
        e_n = tree.ew[0, c.cur]      # [K] row per plane (plane-major ew)
        e_w = tree.ew[1, c.cur]
        pr = tree.priors[c.cur]
        acts = tree.actions[c.cur]
        valid = acts >= 0
        q = jnp.where(e_n > 0, e_w / jnp.maximum(e_n, 1.0), 0.0)
        u = c_puct * pr * jnp.sqrt(c.node_n) / (1.0 + e_n)
        ucb = jnp.where(valid, q + u, -jnp.inf)
        # Lexicographic argmax on (ucb, movegen precedence): the reference's
        # children dict is built in move-generation order and its strict-'>'
        # select (mcts.py:51-57) keeps the FIRST max, so exact UCB ties
        # resolve to the earliest move in generator order (see _PACK). The
        # stored slot values sort exactly that way, so the secondary key is
        # a plain argmin over the packed values. (Every search's first
        # simulation is an all-way tie at N_parent=0, so this matters from
        # sim 0 on.)
        tied = valid & (ucb == jnp.max(ucb))
        slot = jnp.argmin(
            jnp.where(tied, acts, jnp.int32(2**30))
        ).astype(jnp.int32)
        a = acts[slot] % _PACK
        # cheap core step: interior nodes' terminality lives in the tree;
        # the leaf's legal mask / terminal verdict is computed once after
        # descent (run_mcts calls evaluate_batch on the batch of leaves)
        core2 = _core_step(c.core, a)
        ch = tree.child[c.cur, slot]
        is_new = ch == 0
        ch_unexpanded = ~is_new & ~tree.expanded[ch]
        too_deep = c.depth + 1 >= max_depth

        stop = is_new | ch_unexpanded | too_deep
        mode = jnp.where(
            is_new,
            _MODE_CREATE,
            jnp.where(ch_unexpanded | too_deep, _MODE_REVISIT, c.mode),
        ).astype(jnp.int32)
        return Carry(
            cur=jnp.where(is_new, c.cur, ch),
            node_n=e_n[slot],
            core=core2,
            stop=stop,
            mode=mode,
            leaf=jnp.where(is_new, c.leaf, ch),
            depth=c.depth + 1,
            path_node=c.path_node.at[c.depth].set(c.cur),
            path_slot=c.path_slot.at[c.depth].set(slot),
        )

    root_has_children = tree.expanded[0]
    init = Carry(
        cur=jnp.int32(0),
        node_n=tree.root_n.astype(jnp.float32),
        core=root,
        stop=~root_has_children,
        mode=jnp.where(root_has_children, _MODE_CREATE, _MODE_NOOP).astype(
            jnp.int32
        ),
        leaf=jnp.int32(0),
        depth=jnp.int32(0),
        path_node=jnp.zeros((max_depth,), jnp.int32),
        path_slot=jnp.zeros((max_depth,), jnp.int32),
    )
    out = jax.lax.while_loop(cond, body, init)
    # sel_parent/sel_slot = last recorded edge
    last = jnp.maximum(out.depth - 1, 0)
    return (
        out.mode, out.path_node[last], out.path_slot[last], out.leaf,
        out.core, out.path_node, out.path_slot, out.depth,
    )


# ------------------------------------------------------------- search -----


def backup_path_delta(pnode_d, pslot_d, di, depth, v, node_iota, slot_iota):
    """[B, 2, N, K] stat delta from a recorded descent path of static
    length len(di), as ONE bf16 one-hot contraction with the backed-up
    value factored out. The edge at depth d leads to the node at depth
    d+1; the deepest updated edge is d = depth-1 and carries v, signs
    alternating upward (reference: mcts.py:66-73).

    Exactness: a descent path never revisits an edge, so every output
    element of the contraction has AT MOST ONE nonzero term — there is no
    accumulation, hence no rounding. The operands can therefore be bf16
    in {-1, 0, 1} (exact) and the value applied afterwards as one
    multiply (fl(v * +-1) = +-v, exact), halving the HBM traffic of the
    f32 formulation that carried +-v inside the contraction operand.
    Shared by the PUCT and Gumbel searches."""
    validp = di[None, :] < depth[:, None]              # [B, D]
    ohn = (
        (pnode_d[:, :, None] == node_iota) & validp[:, :, None]
    ).astype(jnp.bfloat16)                             # [B, D, N]
    ohk = (pslot_d[:, :, None] == slot_iota).astype(jnp.bfloat16)
    odd = ((depth[:, None] - 1 - di) % 2) != 0
    sign = jnp.where(
        validp, jnp.where(odd, -1.0, 1.0), 0.0
    ).astype(jnp.bfloat16)                             # [B, D]
    wn = jnp.stack([validp.astype(jnp.bfloat16), sign], axis=2)
    ohk2 = ohk[:, :, None, :] * wn[..., None]          # [B,D,2,K]
    delta = jnp.einsum(
        "bdn,bdtk->btnk", ohn, ohk2,
        preferred_element_type=jnp.float32,
    )
    scale = jnp.stack([jnp.ones_like(v), v], axis=1)   # [B, 2]
    return delta * scale[:, :, None, None]


def make_slot_priors(logits_eval: bool, k: int):
    """(board, side, legal, scores) -> (slot actions, valid, prior values);
    with ``logits_eval`` the exact softmax is computed only at the <=123
    legal slots (the full [B, 8100] tensor is never materialized)."""

    def slot_priors(board, side, legal, scores):
        s32 = scores.astype(jnp.float32)
        sa, va, picked = _legal_slots_priors(board, side, legal, s32, k)
        if logits_eval:
            m = jnp.max(s32, axis=-1, keepdims=True)
            z = jnp.sum(jnp.exp(s32 - m), axis=-1, keepdims=True)
            picked = jnp.exp(picked - m) / z
        return sa, va, picked

    return slot_priors


def run_mcts(
    eval_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    roots: E.EnvState,
    rng: jax.Array,
    cfg: MCTSConfig,
    add_noise: bool = True,
    logits_eval: bool = False,
    sim_budget: "jax.Array | None" = None,
    noise_mask: "jax.Array | None" = None,
) -> SearchResult:
    """Full search over a batch of root states.

    eval_fn(features[B,10,9,15]) -> (policy[B,8100], value[B]). By default
    ``policy`` must already be softmaxed (reference: model.py:109-124); with
    ``logits_eval=True`` it is RAW LOGITS and the exact softmax values are
    computed only at the <=123 legal slots (same exp(l - max)/sumexp formula
    — the full [B, 8100] probability tensor is never materialized, saving
    ~9% of search device time). Jit-compatible; ``cfg``, ``add_noise`` and
    ``logits_eval`` are static.

    ``sim_budget`` (optional int32[B]): per-game simulation budget <=
    cfg.num_simulations — simulation i is a no-op for game b when
    i >= sim_budget[b] (its descent/backup are masked to depth 0), so a
    game's result equals a search run with exactly its budget. Used by
    per-game playout-cap randomization (KataGo arXiv:1902.10565 §3.1);
    note the lockstep batch still pays cfg.num_simulations of compute.
    ``noise_mask`` (optional bool[B]): with add_noise, apply the Dirichlet
    root noise only to these games (KataGo runs its cheap searches
    noiseless)."""
    batch = roots.board.shape[0]
    k = cfg.max_children
    plan = _stage_plan(cfg.num_simulations, batch)
    slot_priors = make_slot_priors(logits_eval, k)
    tree = init_tree(batch, cfg, num_nodes=plan[0][2])

    # Root priors (+ optional Dirichlet noise), reference mcts.py:107-123.
    feats = E.v_features(roots.board, roots.side)
    probs, _ = eval_fn(feats)
    slot_a, valid, p_raw = slot_priors(
        roots.board, roots.side, roots.legal, probs
    )
    p_slot = _mask_normalize(p_raw, valid)

    if add_noise:
        noise_g = jax.random.gamma(
            rng, cfg.dirichlet_alpha, shape=(batch, k), dtype=jnp.float32
        )
        noise_g = jnp.where(valid, noise_g, 0.0)
        noise = noise_g / jnp.maximum(
            jnp.sum(noise_g, axis=-1, keepdims=True), 1e-30
        )
        p_noised = jnp.where(
            valid, (1.0 - cfg.noise_frac) * p_slot + cfg.noise_frac * noise, 0.0
        )
        if noise_mask is not None:
            p_slot = jnp.where(noise_mask[:, None], p_noised, p_slot)
        else:
            p_slot = p_noised

    has_any = jnp.any(valid, axis=-1)
    tree = tree.replace(
        actions=tree.actions.at[:, 0].set(slot_a),
        priors=tree.priors.at[:, 0].set(p_slot),
        expanded=tree.expanded.at[:, 0].set(has_any),
    )

    descend = jax.vmap(_descend_one, in_axes=(0, 0, None, None))
    bidx = jnp.arange(batch)
    slot_iota = jnp.arange(k, dtype=jnp.int32)
    root_core = _Core(
        board=roots.board, side=roots.side, ply=roots.ply,
        quiet=roots.quiet, hist=roots.hist,
    )
    dummy_legal = jnp.zeros((batch, ACTION_SPACE), bool)
    dummy_done = jnp.zeros((batch,), bool)
    dummy_win = jnp.zeros((batch,), jnp.int8)

    def sim_body(node_iota, d_iota, max_depth, i, tree):
        # node_iota/d_iota/max_depth are the CURRENT SEGMENT's static node
        # budget and path capacity (see _stage_plan); bound via partial.
        mode, sel_parent, sel_slot, leaf, core, pnode, pslot, depth = descend(
            tree, root_core, cfg.c_puct, max_depth
        )
        if sim_budget is not None:
            # per-game budget: simulations past a game's budget are no-ops
            # (depth 0 -> zero backup contraction; NOOP -> no create, no
            # child pointer, no root_n). The node row written at new_idx is
            # garbage but unreachable, same as the non-create case below.
            active = i < sim_budget
            mode = jnp.where(active, mode, _MODE_NOOP)
            depth = jnp.where(active, depth, 0)
        env_leaf = E.EnvState(
            board=core.board, side=core.side, ply=core.ply, quiet=core.quiet,
            hist=core.hist, done=dummy_done, winner=dummy_win,
            legal=dummy_legal,
        )
        env_leaf = E.evaluate_batch(env_leaf)
        leaf_feats = E.v_features(env_leaf.board, env_leaf.side)
        probs, value = eval_fn(leaf_feats)

        is_create = mode == _MODE_CREATE
        new_idx = i + 1  # deterministic node allocation (see module doc)

        # --- node row writes: uniform index, a dynamic-update-slice each
        # (garbage for non-create games, but unreachable: no child pointer)
        t_val = jnp.where(env_leaf.winner != 0, 1.0, 0.0)  # mcts.py:138-140
        sa, va, p_raw = slot_priors(
            env_leaf.board, env_leaf.side, env_leaf.legal, probs
        )
        ps = _mask_normalize(p_raw, va)

        def row_set(arr, vals):
            return jax.lax.dynamic_update_slice_in_dim(
                arr, vals[:, None].astype(arr.dtype), new_idx, axis=1
            )

        tree = tree.replace(
            expanded=row_set(tree.expanded, ~env_leaf.done),
            terminal=row_set(tree.terminal, env_leaf.done),
            term_value=row_set(tree.term_value, t_val),
            actions=row_set(tree.actions, sa),
            priors=row_set(tree.priors, ps),
        )
        # child pointer: the only true per-batch scatter, B scalars
        old = tree.child[bidx, sel_parent, sel_slot]
        child = tree.child.at[bidx, sel_parent, sel_slot].set(
            jnp.where(is_create, new_idx, old)
        )

        # --- value to back up (parent perspective at the leaf) ------------
        v_create = jnp.where(env_leaf.done, t_val, -value)  # mcts.py:138-150
        term_leaf = tree.term_value[bidx, leaf]
        v = jnp.where(is_create, v_create, term_leaf)

        # --- backup: dense one-hot contraction over the recorded path ----
        # edge at depth d leads to the node at depth d+1; the deepest
        # updated edge is d = depth-1 and carries v, signs alternate upward
        def backup_delta(pnode_d, pslot_d, di):
            return backup_path_delta(
                pnode_d, pslot_d, di, depth, v, node_iota, slot_iota
            )

        # Full static-length contraction, fused with the ew add. A
        # depth-capped variant (lax.cond: short contraction for typical
        # <=10-deep paths, exact full-length fallback) measured SLOWER —
        # 145k sims/s with the add outside the cond, 163k with the add
        # inside each branch, vs 168k for this form (standard config): the
        # cond double-buffers the [B, N, 2, K] carry and breaks the
        # conv+add in-place fusion, costing more than the shorter
        # contraction saves. See docs/PERF_NOTES.md.
        ew = tree.ew + backup_delta(pnode, pslot, d_iota)

        return tree.replace(
            child=child,
            ew=ew,
            root_n=tree.root_n + (mode != _MODE_NOOP).astype(jnp.int32),
        )

    # One fori_loop per stage of the node-budget plan, the tree zero-padded
    # up between stages (see _stage_plan). The barrier before each loop
    # stops XLA from sinking the zero-init / zero-pad of the stats into the
    # loop body as select(i == lo, padded, carry) — a whole-ew-array select
    # every simulation (measured 132 ms/move = 12% at standard config).
    for lo, hi, n_seg, d_seg in plan:
        tree = _grow_tree(tree, n_seg)
        tree = jax.lax.optimization_barrier(tree)
        body = partial(
            sim_body,
            jnp.arange(n_seg, dtype=jnp.int32),
            jnp.arange(d_seg, dtype=jnp.int32),
            d_seg,
        )
        tree = jax.lax.fori_loop(lo, hi, body, tree)

    visits_f = tree.ew[:, 0, 0, :]
    w_root = tree.ew[:, 1, 0, :]
    total = jnp.maximum(jnp.sum(visits_f, axis=-1), 1.0)
    root_value = jnp.sum(w_root, axis=-1) / total
    root_packed = tree.actions[:, 0, :]
    root_valid = root_packed >= 0
    return SearchResult(
        actions=unpack_actions(root_packed),
        visits=visits_f.astype(jnp.int32),
        valid=root_valid,
        root_value=root_value,
        order=root_packed,
    )


# ----------------------------------------------------- pi and sampling ----


def greedy_slots(result: SearchResult) -> jax.Array:
    """Most-visited root slot per game, ties resolved to the earliest move
    in the reference's generation order (its temp-0 ``max()`` over the
    insertion-ordered children dict, mcts.py:198)."""
    counts = jnp.where(result.valid, result.visits, -1)
    tied = result.valid & (counts == jnp.max(counts, axis=-1, keepdims=True))
    return jnp.argmin(
        jnp.where(tied, result.order, jnp.int32(2**30)), axis=-1
    )


def action_probs_slots(result: SearchResult, temperature: jax.Array) -> jax.Array:
    """pi over child slots [B, K] with the reference's temperature semantics
    (mcts.py:190-206): temp==0 -> one-hot argmax of visits (first max in
    movegen order), else visits**(1/temp) normalized. Rows with no valid
    slots are all-zero either way (reference mcts.py:111-112 returns a zero
    distribution for positions with no legal actions)."""
    counts = result.visits.astype(jnp.float32)
    temp = jnp.asarray(temperature, jnp.float32)
    t = jnp.broadcast_to(temp, counts.shape[:1])[:, None]

    t_safe = jnp.where(t > 0.0, t, 1.0)  # t==0 rows take the hard branch
    powed = jnp.where(result.valid, counts ** (1.0 / t_safe), 0.0)
    denom = jnp.sum(powed, axis=-1, keepdims=True)
    soft = jnp.where(denom > 0, powed / jnp.where(denom > 0, denom, 1.0), 0.0)

    hard = jax.nn.one_hot(
        greedy_slots(result), counts.shape[-1], dtype=jnp.float32
    )
    hard = jnp.where(jnp.any(result.valid, axis=-1, keepdims=True), hard, 0.0)
    return jnp.where(t == 0.0, hard, soft)


def action_probs_dense(result: SearchResult, temperature: jax.Array) -> jax.Array:
    """Dense pi[B, 8100] (see action_probs_slots). COLD path (tests /
    serving) — the one-hot contraction materializes [B, K, 8100]; it is
    deliberately scatter-free (per-lane index-vector scatter-adds are both
    slow and a miscompile hazard on this backend, PERF_NOTES 5c)."""
    pi_slots = action_probs_slots(result, temperature)
    idx = jnp.where(result.valid, result.actions, 0)
    oh = jax.nn.one_hot(idx, ACTION_SPACE, dtype=jnp.float32)
    dense = jnp.einsum(
        "bk,bka->ba", jnp.where(result.valid, pi_slots, 0.0), oh
    )
    return jnp.where(
        jnp.any(result.valid, axis=-1, keepdims=True), dense, 0.0
    )


def sample_actions(
    result: SearchResult, temperature: jax.Array, rng: jax.Array
) -> jax.Array:
    """Per-game action choice with reference semantics: argmax of pi at
    temp<=0.05-style thresholds is the CALLER's policy; here temp==0 means
    argmax and temp>0 means sampling from visits**(1/temp)."""
    counts = result.visits.astype(jnp.float32)
    t = jnp.broadcast_to(jnp.asarray(temperature, jnp.float32), counts.shape[:1])

    t_safe = jnp.where(t > 0.0, t, 1.0)  # t==0 rows take the greedy branch
    logw = jnp.where(
        result.valid & (counts > 0),
        jnp.log(jnp.maximum(counts, 1e-30)) / t_safe[:, None],
        -jnp.inf,
    )
    gumbel = jax.random.gumbel(rng, counts.shape)
    sampled = jnp.argmax(logw + gumbel, axis=-1)
    slot = jnp.where(t == 0.0, greedy_slots(result), sampled)
    return jnp.take_along_axis(
        result.actions, slot[:, None], axis=-1
    ).squeeze(-1)
