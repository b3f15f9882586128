"""Gumbel AlphaZero search — policy improvement with sequential halving.

Implements "Policy improvement by planning with Gumbel" (Danihelka et al.,
ICLR 2022; the mctx-style root procedure) over the same batched array tree,
env core and backup contraction as the PUCT search (search/mcts.py):

- root: sample one Gumbel g(a) per legal action; consider the top-m actions
  by g + logits (no Dirichlet noise — the Gumbel sample IS the exploration);
- sequential halving: split the simulation budget into ceil(log2 m) phases;
  each phase visits the surviving candidates round-robin, then keeps the
  top half by g + logits + sigma(q̂), with
  sigma(q) = (c_visit + max_b N(b)) * c_scale * q;
- the acted move is the final argmax of that score — guaranteed (in
  expectation over the Gumbel sample) to not regress the raw policy, and
  empirically far stronger than PUCT at small budgets (the paper's result;
  pinned qualitatively by tests/test_gumbel.py);
- interior nodes select deterministically by
  argmax_a pi'(a) - N(a) / (1 + sum_b N(b)),
  pi' = softmax(logits + sigma(completed Q)), completed Q filling unvisited
  children with the visited-weighted value mix v_mix;
- the training target is the improved policy pi' at the root over ALL legal
  moves (not the visit-count distribution).

This is an OPT-IN search mode beyond the reference (the reference has only
the classic PUCT loop, training/mcts.py:94-155); the self-play/eval default
remains the PUCT search whose semantics are pinned to the reference
exactly. Use it where strength per simulation matters: low-latency serving
(a 32-sim Gumbel move approaches a much deeper PUCT move) and
fewer-sims-per-move training runs.

Tree memory, node allocation (simulation i creates node i+1), the env core
step and the bf16 backup contraction are shared with mcts.py — the Gumbel
loop differs only at the root (forced candidate per the halving schedule)
and in the interior selection rule.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..engine import env as E
from .mcts import (
    _MODE_CREATE,
    _MODE_NOOP,
    _MODE_REVISIT,
    _PACK,
    _Core,
    _core_step,
    _mask_normalize,
    MCTSConfig,
    Tree,
    backup_path_delta,
    init_tree,
    make_slot_priors,
    unpack_actions,
)


class GumbelConfig(NamedTuple):
    num_simulations: int = 32
    max_considered: int = 16   # m: root candidates entering the halving
    c_visit: float = 50.0      # sigma(q) = (c_visit + max_N) * c_scale * q
    c_scale: float = 0.1       # (paper / mctx defaults)
    max_children: int = 128


class GumbelResult(NamedTuple):
    actions: jax.Array      # i32[B, K] root actions (-1 pad)
    visits: jax.Array       # i32[B, K] root visit counts
    valid: jax.Array        # bool[B, K]
    chosen: jax.Array       # i32[B] the Gumbel-selected action (-1 if none)
    pi_improved: jax.Array  # f32[B, K] softmax(logits + sigma(completed Q))
    root_value: jax.Array   # f32[B] raw network value at the root
    order: jax.Array        # i32[B, K] movegen-precedence key (as mcts)


def halving_schedule(budget: int, m: int) -> List[Tuple[int, int]]:
    """Sequential-halving segments as [(m_p, num_sims)] with
    sum(num_sims) == budget. Phase p visits its m_p survivors round-robin;
    leftover budget extends the final phase (still round-robin over the
    final survivors)."""
    m = max(1, m)
    phases = max(1, math.ceil(math.log2(m))) if m > 1 else 1
    segs: List[Tuple[int, int]] = []
    remaining = budget
    m_p = m
    for p in range(phases):
        if remaining <= 0:
            break
        per = max(1, budget // (phases * m_p))
        cnt = min(per * m_p, remaining)
        segs.append((m_p, cnt))
        remaining -= cnt
        m_p = max(1, m_p // 2)
    if remaining > 0:
        # remaining > 0 implies every phase appended (segs is non-empty):
        # spend the leftovers as one extra halved phase over the survivors
        segs.append((max(1, segs[-1][0] // 2), remaining))
    if not segs:  # budget <= 0: one zero-sim segment keeps the search
        segs = [(m, 0)]  # well-formed (final scoring over raw priors)
    assert sum(c for _, c in segs) == max(budget, 0), segs
    return segs


def _sigma(q: jax.Array, max_n: jax.Array, cfg: GumbelConfig) -> jax.Array:
    """Monotone Q transform: (c_visit + max_b N(b)) * c_scale * q."""
    return (cfg.c_visit + max_n) * cfg.c_scale * q


def _completed_q(
    n: jax.Array, w: jax.Array, prior: jax.Array, valid: jax.Array,
    raw_value: jax.Array,
) -> jax.Array:
    """Q over all children with unvisited entries filled by the value mix
    v_mix = (v_node + sum_N * weighted_visited_Q) / (1 + sum_N)  (the
    paper's completedQ / mctx qtransform_completed_by_mix_value)."""
    visited = n > 0
    q = jnp.where(visited, w / jnp.maximum(n, 1.0), 0.0)
    sum_n = jnp.sum(n, axis=-1)
    pv = jnp.where(visited & valid, prior, 0.0)
    wq = jnp.sum(pv * q, axis=-1) / jnp.maximum(jnp.sum(pv, axis=-1), 1e-12)
    v_mix = jnp.where(
        sum_n > 0, (raw_value + sum_n * wq) / (1.0 + sum_n), raw_value
    )
    return jnp.where(visited, q, v_mix[..., None])


def _descend_gumbel(
    tree: Tree, node_val: jax.Array, root: _Core, forced_slot: jax.Array,
    max_depth: int, cfg: GumbelConfig,
):
    """Select down one game's tree (vmapped over the batch): the ROOT edge
    is forced to the halving schedule's candidate; interior nodes use the
    deterministic argmax pi'(a) - N(a)/(1 + sum N) rule. Same return shape
    as mcts._descend_one."""

    class Carry(NamedTuple):
        cur: jax.Array
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
        e_n = tree.ew[0, c.cur]      # [K]
        e_w = tree.ew[1, c.cur]
        pr = tree.priors[c.cur]
        acts = tree.actions[c.cur]
        valid = acts >= 0

        # interior deterministic rule (paper §5 "planning at non-root
        # nodes"): pi' from completed Q, pick argmax pi' - n/(1+sum_n)
        cq = _completed_q(e_n, e_w, pr, valid, node_val[c.cur])
        sig = _sigma(cq, jnp.max(e_n), cfg)
        logits = jnp.where(valid, jnp.log(jnp.maximum(pr, 1e-30)), -jnp.inf)
        pi2 = jax.nn.softmax(jnp.where(valid, logits + sig, -jnp.inf))
        score = jnp.where(
            valid,
            pi2 - e_n / (1.0 + jnp.sum(e_n)),
            -jnp.inf,
        )
        tied = valid & (score == jnp.max(score))
        interior = jnp.argmin(
            jnp.where(tied, acts, jnp.int32(2**30))
        ).astype(jnp.int32)
        slot = jnp.where(c.depth == 0, forced_slot, interior)

        a = acts[slot] % _PACK
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
    last = jnp.maximum(out.depth - 1, 0)
    return (
        out.mode, out.path_node[last], out.path_slot[last], out.leaf,
        out.core, out.path_node, out.path_slot, out.depth,
    )


def run_gumbel_mcts(
    eval_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    roots: E.EnvState,
    rng: jax.Array,
    cfg: GumbelConfig,
    logits_eval: bool = False,
) -> GumbelResult:
    """Gumbel root search over a batch of root states. Jit-compatible;
    ``cfg`` and ``logits_eval`` are static. ``eval_fn`` contract matches
    ``run_mcts``."""
    batch = roots.board.shape[0]
    k = cfg.max_children
    # clamp m to the budget: every candidate must receive at least one
    # phase-0 visit, else the final argmax could act a move the search
    # never simulated (unvisited candidates are scored by v_mix alone)
    m = max(1, min(cfg.max_considered, k, max(cfg.num_simulations, 1)))
    segs = halving_schedule(cfg.num_simulations, m)
    slot_priors = make_slot_priors(logits_eval, k)

    tree = init_tree(
        batch, MCTSConfig(max_children=k),
        num_nodes=cfg.num_simulations + 1,
    )
    node_val = jnp.zeros((batch, cfg.num_simulations + 1), jnp.float32)

    # ---- root eval, Gumbel sample, top-m candidates ----------------------
    feats = E.v_features(roots.board, roots.side)
    probs, root_value = eval_fn(feats)
    slot_a, valid, p_raw = slot_priors(
        roots.board, roots.side, roots.legal, probs
    )
    p_slot = _mask_normalize(p_raw, valid)
    # log p differs from the true logits by a per-game constant, which
    # cancels in every softmax/argmax below
    logits = jnp.where(valid, jnp.log(jnp.maximum(p_slot, 1e-30)), -jnp.inf)
    # one Gumbel row PER LANE from split keys: lane i's noise depends on
    # (rng, i) but NOT on the batch width, so a game searched solo and the
    # same game riding lane 0 of a coalesced serving batch draw identical
    # noise (a [batch, k] draw from one key differs per total shape)
    g = jax.vmap(lambda kk: jax.random.gumbel(kk, (k,), jnp.float32))(
        jax.random.split(rng, batch)
    )
    base = jnp.where(valid, g + logits, -jnp.inf)        # g + logits

    top = jax.lax.top_k(base, m)                         # scores desc
    cand_slot = top[1].astype(jnp.int32)                 # [B, m]
    cand_base = top[0]                                   # g + logits, -inf pads
    # games with fewer legal moves than m keep -inf pad columns; the
    # round-robin rank is clamped per game so a pad slot is never forced
    # (sorting between segments keeps finite scores ahead of -inf, so this
    # count is invariant across the halving)
    n_cand = jnp.maximum(
        jnp.sum(jnp.isfinite(cand_base), axis=-1), 1
    ).astype(jnp.int32)

    has_any = jnp.any(valid, axis=-1)
    tree = tree.replace(
        actions=tree.actions.at[:, 0].set(slot_a),
        priors=tree.priors.at[:, 0].set(p_slot),
        expanded=tree.expanded.at[:, 0].set(has_any),
    )
    node_val = node_val.at[:, 0].set(root_value)

    descend = jax.vmap(_descend_gumbel, in_axes=(0, 0, 0, 0, None, None))
    bidx = jnp.arange(batch)
    node_iota = jnp.arange(cfg.num_simulations + 1, dtype=jnp.int32)
    slot_iota = jnp.arange(k, dtype=jnp.int32)
    # >=1 so the path arrays stay indexable when the body traces at
    # budget 0 (the zero-length fori never runs it)
    max_depth = max(1, cfg.num_simulations)
    d_iota = jnp.arange(max_depth, dtype=jnp.int32)
    root_core = _Core(
        board=roots.board, side=roots.side, ply=roots.ply,
        quiet=roots.quiet, hist=roots.hist,
    )
    dummy_legal = jnp.zeros((batch, E.ACTION_SPACE), bool)
    dummy_done = jnp.zeros((batch,), bool)
    dummy_win = jnp.zeros((batch,), jnp.int8)

    def sim_body(m_p, seg_start, i, carry):
        tree, node_val = carry
        eff = jnp.minimum(m_p, n_cand)                   # [B]
        rank = jnp.mod(i - seg_start, eff)
        forced = cand_slot[bidx, rank]
        mode, sel_parent, sel_slot, leaf, core, pnode, pslot, depth = descend(
            tree, node_val, root_core, forced, max_depth, cfg
        )
        env_leaf = E.EnvState(
            board=core.board, side=core.side, ply=core.ply, quiet=core.quiet,
            hist=core.hist, done=dummy_done, winner=dummy_win,
            legal=dummy_legal,
        )
        env_leaf = E.evaluate_batch(env_leaf)
        leaf_feats = E.v_features(env_leaf.board, env_leaf.side)
        probs, value = eval_fn(leaf_feats)

        is_create = mode == _MODE_CREATE
        new_idx = i + 1
        t_val = jnp.where(env_leaf.winner != 0, 1.0, 0.0)
        sa, va, p_leaf = slot_priors(
            env_leaf.board, env_leaf.side, env_leaf.legal, probs
        )
        ps = _mask_normalize(p_leaf, va)

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
        # node's value from ITS OWN mover's perspective (t_val is from the
        # perspective of the player who moved INTO a terminal node)
        node_val = row_set(
            node_val, jnp.where(env_leaf.done, -t_val, value)
        )
        old = tree.child[bidx, sel_parent, sel_slot]
        child = tree.child.at[bidx, sel_parent, sel_slot].set(
            jnp.where(is_create, new_idx, old)
        )
        v_create = jnp.where(env_leaf.done, t_val, -value)
        term_leaf = tree.term_value[bidx, leaf]
        v = jnp.where(is_create, v_create, term_leaf)
        ew = tree.ew + backup_path_delta(
            pnode, pslot, d_iota, depth, v, node_iota, slot_iota
        )
        tree = tree.replace(
            child=child, ew=ew,
            root_n=tree.root_n + (mode != _MODE_NOOP).astype(jnp.int32),
        )
        return tree, node_val

    def cand_scores(tree, width):
        """g + logits + sigma(q̂) for the first ``width`` candidate
        columns; columns at rank >= width (eliminated in an earlier
        halving) are masked to -inf."""
        oh = (
            cand_slot[:, :, None] == slot_iota[None, None, :]
        ).astype(jnp.float32)                            # [B, m, K]
        n_root = tree.ew[:, 0, 0, :]
        w_root = tree.ew[:, 1, 0, :]
        root_prior = tree.priors[:, 0, :]
        root_valid = tree.actions[:, 0, :] >= 0
        cq = _completed_q(n_root, w_root, root_prior, root_valid, root_value)
        sig = _sigma(cq, jnp.max(n_root, axis=-1, keepdims=True), cfg)
        sig_c = jnp.einsum("bmk,bk->bm", oh, sig)
        alive = jnp.arange(m)[None, :] < width
        return jnp.where(alive, cand_base + sig_c, -jnp.inf)

    lo = 0
    for si, (m_p, cnt) in enumerate(segs):
        body = partial(sim_body, jnp.int32(m_p), jnp.int32(lo))
        # barrier: stop XLA sinking the zero-init of the stats into the
        # loop body as a whole-array select every simulation (the measured
        # 12%-of-move-time pathology run_mcts guards against, mcts.py)
        tree, node_val = jax.lax.optimization_barrier((tree, node_val))
        tree, node_val = jax.lax.fori_loop(
            lo, lo + cnt, body, (tree, node_val)
        )
        lo += cnt
        if si + 1 < len(segs):
            # halving: re-sort the survivors by g + logits + sigma(q̂) so
            # the next segment's round-robin over ranks < m_next visits
            # exactly the kept half
            scores = cand_scores(tree, m_p)
            order = jnp.argsort(-scores, axis=-1)
            cand_slot = jnp.take_along_axis(cand_slot, order, axis=-1)
            cand_base = jnp.take_along_axis(cand_base, order, axis=-1)

    # ---- final selection + improved policy -------------------------------
    final_scores = cand_scores(tree, segs[-1][0])
    win = jnp.argmax(final_scores, axis=-1)
    win_slot = cand_slot[bidx, win]
    root_packed = tree.actions[:, 0, :]
    chosen = jnp.where(
        has_any, unpack_actions(root_packed)[bidx, win_slot], -1
    )

    n_root = tree.ew[:, 0, 0, :]
    root_valid = root_packed >= 0
    cq = _completed_q(
        n_root, tree.ew[:, 1, 0, :], tree.priors[:, 0, :], root_valid,
        root_value,
    )
    sig = _sigma(cq, jnp.max(n_root, axis=-1, keepdims=True), cfg)
    pi2 = jax.nn.softmax(
        jnp.where(root_valid, logits + sig, -jnp.inf), axis=-1
    )
    pi2 = jnp.where(root_valid, pi2, 0.0)

    return GumbelResult(
        actions=unpack_actions(root_packed),
        visits=n_root.astype(jnp.int32),
        valid=root_valid,
        chosen=chosen,
        pi_improved=pi2,
        root_value=root_value,
        order=root_packed,
    )
