"""Batched array-based MCTS (AlphaZero PUCT) over the vectorized env.

TPU-native redesign of the reference's per-game Python object tree
(reference: training/mcts.py). The whole batch of games searches in lockstep:
each simulation descends every game's tree (vmapped, masked while_loop),
evaluates ALL leaves in ONE fused network call, then expands and backs up
(vmapped). This deletes the reference's socket inference server — batching
is structural, not opportunistic (reference: training/inference_server.py,
GPU_INFERENCE_FIX_SUMMARY.md:73 measured a mean batch of 3.5; here the batch
is the full game count every simulation).

Memory layout: fixed-size per-game arrays [num_nodes, max_children] with
edge statistics stored on the parent (child visit count N and total value W
live at the parent's slot). max_children=128 covers the theoretical
per-position legal-move bound (<=119; enforced by an oracle property test).

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
  (mcts.py:190-206).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..engine import env as E

ACTION_SPACE = E.ACTION_SPACE


class MCTSConfig(NamedTuple):
    num_simulations: int = 200
    c_puct: float = 1.5
    dirichlet_alpha: float = 0.3
    noise_frac: float = 0.25
    max_children: int = 128


@struct.dataclass
class Tree:
    """Per-game search tree, batched on the leading axis.

    Edge stats (e_n, e_w) are stored at the parent: e_w is the sum of backed-
    up values from the parent's perspective (reference: mcts.py:21-73).
    """

    expanded: jax.Array     # bool[B, N]
    terminal: jax.Array     # bool[B, N]
    term_value: jax.Array   # f32[B, N] (parent-perspective value at terminals)
    parent: jax.Array       # i32[B, N]
    parent_slot: jax.Array  # i32[B, N]
    actions: jax.Array      # i32[B, N, K], -1 = empty slot
    priors: jax.Array       # f32[B, N, K]
    child: jax.Array        # i32[B, N, K], 0 = not yet created
    e_n: jax.Array          # i32[B, N, K]
    e_w: jax.Array          # f32[B, N, K]
    root_n: jax.Array       # i32[B]
    n_nodes: jax.Array      # i32[B]


class SearchResult(NamedTuple):
    actions: jax.Array   # i32[B, K] root actions (-1 pad)
    visits: jax.Array    # i32[B, K] root visit counts
    valid: jax.Array     # bool[B, K]
    root_value: jax.Array  # f32[B] mean root value (diagnostics)


# ---------------------------------------------------------------------------


def _mask_normalize(
    probs: jax.Array, slot_actions: jax.Array, valid: jax.Array
) -> jax.Array:
    """Priors over child slots: mask to legal, renormalize; uniform fallback
    when the legal probability mass is zero (reference: mcts.py:176-188)."""
    p = jnp.take_along_axis(probs, jnp.maximum(slot_actions, 0), axis=-1)
    p = jnp.where(valid, p, 0.0)
    psum = jnp.sum(p, axis=-1, keepdims=True)
    n_valid = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1)
    uniform = valid.astype(jnp.float32) / n_valid
    return jnp.where(psum > 0, p / jnp.where(psum > 0, psum, 1.0), uniform)


def _legal_slots(legal: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Compact an 8100-wide legal mask into (actions[K], valid[K]) slots,
    ascending action order."""
    v, idx = jax.lax.top_k(legal.astype(jnp.float32), k)
    valid = v > 0.5
    return jnp.where(valid, idx, -1).astype(jnp.int32), valid


def init_tree(batch: int, cfg: MCTSConfig) -> Tree:
    n = cfg.num_simulations + 1
    k = cfg.max_children
    zi = lambda *s: jnp.zeros((batch, *s), jnp.int32)  # noqa: E731
    zf = lambda *s: jnp.zeros((batch, *s), jnp.float32)  # noqa: E731
    zb = lambda *s: jnp.zeros((batch, *s), bool)  # noqa: E731
    return Tree(
        expanded=zb(n),
        terminal=zb(n),
        term_value=zf(n),
        parent=jnp.full((batch, n), -1, jnp.int32),
        parent_slot=zi(n),
        actions=jnp.full((batch, n, k), -1, jnp.int32),
        priors=zf(n, k),
        child=zi(n, k),
        e_n=zi(n, k),
        e_w=zf(n, k),
        root_n=zi(),
        n_nodes=jnp.ones((batch,), jnp.int32),
    )


# --------------------------------------------------------------- descent ---

_MODE_CREATE, _MODE_REVISIT, _MODE_NOOP = 0, 1, 2


def _descend_one(tree: Tree, root_state: E.EnvState, c_puct: float, max_depth: int):
    """Select down one game's tree to a leaf. Returns
    (mode, sel_parent, sel_slot, leaf_node, env_leaf)."""

    class Carry(NamedTuple):
        cur: jax.Array
        node_n: jax.Array
        env: E.EnvState
        stop: jax.Array
        mode: jax.Array
        sel_parent: jax.Array
        sel_slot: jax.Array
        leaf: jax.Array
        depth: jax.Array

    def cond(c: Carry):
        return ~c.stop

    def body(c: Carry) -> Carry:
        e_n = tree.e_n[c.cur]
        e_w = tree.e_w[c.cur]
        pr = tree.priors[c.cur]
        acts = tree.actions[c.cur]
        valid = acts >= 0
        q = jnp.where(e_n > 0, e_w / jnp.maximum(e_n, 1), 0.0)
        u = c_puct * pr * jnp.sqrt(c.node_n.astype(jnp.float32)) / (1.0 + e_n)
        ucb = jnp.where(valid, q + u, -jnp.inf)
        slot = jnp.argmax(ucb).astype(jnp.int32)
        a = acts[slot]
        # cheap core step: interior nodes' terminality lives in the tree;
        # the leaf's legal mask / terminal verdict is computed once after
        # descent (run_mcts calls evaluate_state on the batch of leaves)
        env2 = E.step_core(c.env, a)
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
            env=env2,
            stop=stop,
            mode=mode,
            sel_parent=c.cur,
            sel_slot=slot,
            leaf=jnp.where(is_new, c.leaf, ch),
            depth=c.depth + 1,
        )

    root_has_children = tree.expanded[0]
    init = Carry(
        cur=jnp.int32(0),
        node_n=tree.root_n,
        env=root_state,
        stop=~root_has_children,
        mode=jnp.where(root_has_children, _MODE_CREATE, _MODE_NOOP).astype(
            jnp.int32
        ),
        sel_parent=jnp.int32(0),
        sel_slot=jnp.int32(0),
        leaf=jnp.int32(0),
        depth=jnp.int32(0),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out.mode, out.sel_parent, out.sel_slot, out.leaf, out.env


# --------------------------------------------------- expand and backup ----


def _expand_backup_one(
    tree_slices,
    mode,
    sel_parent,
    sel_slot,
    leaf,
    env_leaf: E.EnvState,
    probs,
    value,
    k: int,
):
    """Per-game tree update after the fused NN call. Operates on this game's
    slice of the tree arrays (vmapped)."""
    (
        expanded, terminal, term_value, parent, parent_slot,
        actions, priors, child, e_n, e_w, root_n, n_nodes,
    ) = tree_slices

    is_create = mode == _MODE_CREATE
    is_revisit = mode == _MODE_REVISIT
    new_idx = n_nodes  # next free node id (only consumed when is_create)

    # --- node creation -----------------------------------------------
    t_val = jnp.where(env_leaf.winner != 0, 1.0, 0.0)  # mcts.py:138-140
    slot_a, valid = _legal_slots(env_leaf.legal, k)
    p_slot = _mask_normalize(probs, slot_a, valid)
    node_expanded = ~env_leaf.done  # non-terminal => legal moves exist

    def wset(arr, idx, val):
        return arr.at[idx].set(jnp.where(is_create, val, arr[idx]))

    expanded = wset(expanded, new_idx, node_expanded)
    terminal = wset(terminal, new_idx, env_leaf.done)
    term_value = wset(term_value, new_idx, t_val)
    parent = wset(parent, new_idx, sel_parent)
    parent_slot = wset(parent_slot, new_idx, sel_slot)
    actions = wset(actions, new_idx, slot_a)
    priors = wset(priors, new_idx, p_slot)
    child = child.at[sel_parent, sel_slot].set(
        jnp.where(is_create, new_idx, child[sel_parent, sel_slot])
    )
    n_nodes = n_nodes + is_create.astype(jnp.int32)

    # --- value to back up (parent perspective) -------------------------
    v_create = jnp.where(env_leaf.done, t_val, -value)  # mcts.py:138-150
    v = jnp.where(is_create, v_create, term_value[leaf])

    # --- backup along parent pointers ----------------------------------
    start = jnp.where(is_create, new_idx, leaf)
    start = jnp.where(mode == _MODE_NOOP, 0, start)

    def bcond(c):
        cur, _, _, _ = c
        return cur != 0

    def bbody(c):
        cur, val, en, ew = c
        p, s = parent[cur], parent_slot[cur]
        en = en.at[p, s].add(1)
        ew = ew.at[p, s].add(val)
        return p, -val, en, ew

    _, _, e_n, e_w = jax.lax.while_loop(bcond, bbody, (start, v, e_n, e_w))
    root_n = root_n + (mode != _MODE_NOOP).astype(jnp.int32)

    return (
        expanded, terminal, term_value, parent, parent_slot,
        actions, priors, child, e_n, e_w, root_n, n_nodes,
    )


# ------------------------------------------------------------- search -----


def run_mcts(
    eval_fn: Callable[[jax.Array], Tuple[jax.Array, jax.Array]],
    roots: E.EnvState,
    rng: jax.Array,
    cfg: MCTSConfig,
    add_noise: bool = True,
) -> SearchResult:
    """Full search over a batch of root states.

    eval_fn(features[B,10,9,15]) -> (policy_probs[B,8100], value[B]); the
    probabilities must already be softmaxed (reference: model.py:109-124).
    Jit-compatible; ``cfg`` and ``add_noise`` are static.
    """
    batch = roots.board.shape[0]
    k = cfg.max_children

    tree = init_tree(batch, cfg)

    # Root priors (+ optional Dirichlet noise), reference mcts.py:107-123.
    feats = E.v_features(roots.board, roots.side)
    probs, _ = eval_fn(feats)
    slot_a, valid = jax.vmap(_legal_slots, in_axes=(0, None))(roots.legal, k)
    p_slot = _mask_normalize(probs, slot_a, valid)

    if add_noise:
        noise_g = jax.random.gamma(
            rng, cfg.dirichlet_alpha, shape=(batch, k), dtype=jnp.float32
        )
        noise_g = jnp.where(valid, noise_g, 0.0)
        noise = noise_g / jnp.maximum(
            jnp.sum(noise_g, axis=-1, keepdims=True), 1e-30
        )
        p_slot = jnp.where(
            valid, (1.0 - cfg.noise_frac) * p_slot + cfg.noise_frac * noise, 0.0
        )

    has_any = jnp.any(valid, axis=-1)
    tree = tree.replace(
        actions=tree.actions.at[:, 0].set(slot_a),
        priors=tree.priors.at[:, 0].set(p_slot),
        expanded=tree.expanded.at[:, 0].set(has_any),
    )

    max_depth = cfg.num_simulations + 2
    descend = jax.vmap(_descend_one, in_axes=(0, 0, None, None))

    def sim_body(i, tree):
        del i
        mode, sel_parent, sel_slot, leaf, env_leaf = descend(
            tree, roots, cfg.c_puct, max_depth
        )
        env_leaf = jax.vmap(E.evaluate_state)(env_leaf)
        leaf_feats = E.v_features(env_leaf.board, env_leaf.side)
        probs, value = eval_fn(leaf_feats)

        slices = (
            tree.expanded, tree.terminal, tree.term_value, tree.parent,
            tree.parent_slot, tree.actions, tree.priors, tree.child,
            tree.e_n, tree.e_w, tree.root_n, tree.n_nodes,
        )
        out = jax.vmap(
            _expand_backup_one,
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None),
        )(
            tuple(jax.tree.map(lambda x: x, slices)),
            mode, sel_parent, sel_slot, leaf, env_leaf, probs, value, k,
        )
        return Tree(
            expanded=out[0], terminal=out[1], term_value=out[2], parent=out[3],
            parent_slot=out[4], actions=out[5], priors=out[6], child=out[7],
            e_n=out[8], e_w=out[9], root_n=out[10], n_nodes=out[11],
        )

    tree = jax.lax.fori_loop(0, cfg.num_simulations, sim_body, tree)

    visits = tree.e_n[:, 0, :]
    w = tree.e_w[:, 0, :]
    total = jnp.maximum(jnp.sum(visits, axis=-1), 1)
    root_value = jnp.sum(w, axis=-1) / total
    root_valid = tree.actions[:, 0, :] >= 0
    return SearchResult(
        actions=tree.actions[:, 0, :],
        visits=visits,
        valid=root_valid,
        root_value=root_value,
    )


# ----------------------------------------------------- pi and sampling ----


def action_probs_slots(result: SearchResult, temperature: jax.Array) -> jax.Array:
    """pi over child slots [B, K] with the reference's temperature semantics
    (mcts.py:190-206): temp==0 -> one-hot argmax of visits, else
    visits**(1/temp) normalized."""
    counts = result.visits.astype(jnp.float32)
    temp = jnp.asarray(temperature, jnp.float32)
    t = jnp.broadcast_to(temp, counts.shape[:1])[:, None]

    t_safe = jnp.where(t > 0.0, t, 1.0)  # t==0 rows take the hard branch
    powed = jnp.where(result.valid, counts ** (1.0 / t_safe), 0.0)
    denom = jnp.sum(powed, axis=-1, keepdims=True)
    soft = jnp.where(denom > 0, powed / jnp.where(denom > 0, denom, 1.0), 0.0)

    best = jnp.argmax(
        jnp.where(result.valid, counts, -1.0), axis=-1
    )
    hard = jax.nn.one_hot(best, counts.shape[-1], dtype=jnp.float32)
    return jnp.where(t == 0.0, hard, soft)


def action_probs_dense(result: SearchResult, temperature: jax.Array) -> jax.Array:
    """Dense pi[B, 8100] (see action_probs_slots)."""
    pi_slots = action_probs_slots(result, temperature)
    batch = pi_slots.shape[0]
    dense = jnp.zeros((batch, ACTION_SPACE), jnp.float32)
    idx = jnp.maximum(result.actions, 0)
    dense = jax.vmap(lambda d, i, p: d.at[i].add(p))(dense, idx, pi_slots)
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
    greedy = jnp.argmax(jnp.where(result.valid, counts, -1.0), axis=-1)
    slot = jnp.where(t == 0.0, greedy, sampled)
    return jnp.take_along_axis(
        result.actions, slot[:, None], axis=-1
    ).squeeze(-1)
