"""Gated model evaluation: candidate vs incumbent, alternating colors.

Reference semantics (training/train.py:449-535): eval_games matches, the
candidate takes red in even-indexed games, temperature 0 and no root noise,
eval_simulations per move; a game not finished at max_game_length is a draw
(train.py:494-496 — NO material adjudication here, unlike self-play);
win_rate = (wins + 0.5*draws) / games, promotion at >= eval_win_rate.

TPU-native: all eval games run in one lockstep batch, split into contiguous
color halves (candidate is red in the first half). Eval games start from
the initial position with no random openings, so every live game sits at
the same ply — at any ply exactly one model is to move in each half, and
each model searches only its half (the reference likewise only ever runs
the mover's search, train.py:478-490).

``evaluate_pair`` is the one-shot jittable program; ``make_hosted_eval``
drives bounded segments from the host (accelerator runtimes kill single
programs past a wall-clock budget; see selfplay.py)."""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from ..engine import env as E
from ..search import mcts as M


class EvalSettings(NamedTuple):
    num_simulations: int = 100
    c_puct: float = 1.5
    max_children: int = 128
    max_game_length: int = 300


class EvalOut(NamedTuple):
    new_wins: jax.Array
    old_wins: jax.Array
    draws: jax.Array
    winners: jax.Array      # int8[B] (+1 red, -1 black, 0 draw)
    new_is_red: jax.Array   # bool[B]
    avg_plies: jax.Array    # f32 scalar, mean game length


class EvalCarry(NamedTuple):
    states: E.EnvState
    t: jax.Array
    rng: jax.Array


def _init_carry(batch: int, rng: jax.Array, batch_sharding=None) -> EvalCarry:
    states = E.reset_batch(batch)
    if batch_sharding is not None:
        states = jax.lax.with_sharding_constraint(states, batch_sharding)
    return EvalCarry(states=states, t=jnp.int32(0), rng=rng)


def _greedy(res: M.SearchResult) -> jax.Array:
    # reference temp-0 pick: first max-visit child in movegen order
    slot = M.greedy_slots(res)
    return jnp.take_along_axis(res.actions, slot[:, None], axis=-1).squeeze(-1)


def _make_body(
    eval_new: Callable,
    eval_old: Callable,
    batch: int,
    s: EvalSettings,
    logits_eval: bool,
    select_new: Callable | None = None,
    select_old: Callable | None = None,
    search_new: Callable | None = None,
    search_old: Callable | None = None,
) -> Callable[[EvalCarry], EvalCarry]:
    """Per-ply body of the color-halved lockstep match.

    ``select_new``/``select_old`` map ``(SearchResult, key) -> actions`` for
    each half; the default is the reference's deterministic greedy pick
    (temperature 0, train.py:478-496). ``search_new``/``search_old`` map
    ``(eval_fn, states, key) -> result`` and default to the shared PUCT
    search at s.num_simulations — the arena overrides them to pit
    different algorithms/budgets (e.g. gumbel-32 vs puct-200). This is the
    ONE copy of the swap/ordering logic all match drivers share."""
    half = batch // 2
    mcfg = M.MCTSConfig(
        num_simulations=s.num_simulations,
        c_puct=s.c_puct,
        max_children=s.max_children,
    )
    if select_new is None:
        select_new = lambda res, k: _greedy(res)  # noqa: E731
    if select_old is None:
        select_old = lambda res, k: _greedy(res)  # noqa: E731

    def _default_search(ev, st, k):
        return M.run_mcts(ev, st, k, mcfg, add_noise=False,
                          logits_eval=logits_eval)

    if search_new is None:
        search_new = _default_search
    if search_old is None:
        search_old = _default_search

    def swap_halves(tree):
        return jax.tree.map(
            lambda x: jnp.concatenate([x[half:], x[:half]], axis=0), tree
        )

    def body(c: EvalCarry) -> EvalCarry:
        rng, k1, k2, ka, kb = jax.random.split(c.rng, 5)
        # red moves at even plies (no openings, all games in lockstep);
        # order the batch so the candidate's games come first, search each
        # half with only its mover's model, then restore the order
        new_first = (c.t % 2) == 0  # candidate is red in the first half
        ordered = jax.lax.cond(
            new_first, lambda x: x, swap_halves, c.states
        )
        top = jax.tree.map(lambda x: x[:half], ordered)
        bot = jax.tree.map(lambda x: x[half:], ordered)
        res_new = search_new(eval_new, top, k1)
        res_old = search_old(eval_old, bot, k2)
        act_ordered = jnp.concatenate(
            [select_new(res_new, ka), select_old(res_old, kb)]
        )
        act = jax.lax.cond(
            new_first, lambda a: a, swap_halves, act_ordered
        )
        return EvalCarry(states=E.v_step(c.states, act), t=c.t + 1, rng=rng)

    return body


def _finalize(out: EvalCarry, batch: int) -> EvalOut:
    half = batch // 2
    new_is_red = jnp.arange(batch) < half
    winners = jnp.where(out.states.done, out.states.winner, 0).astype(jnp.int8)
    new_won = ((winners == 1) & new_is_red) | ((winners == -1) & ~new_is_red)
    old_won = ((winners == -1) & new_is_red) | ((winners == 1) & ~new_is_red)
    return EvalOut(
        new_wins=jnp.sum(new_won.astype(jnp.int32)),
        old_wins=jnp.sum(old_won.astype(jnp.int32)),
        draws=jnp.sum((winners == 0).astype(jnp.int32)),
        winners=winners,
        new_is_red=new_is_red,
        avg_plies=jnp.mean(out.states.ply.astype(jnp.float32)),
    )


def evaluate_pair(
    eval_new: Callable,
    eval_old: Callable,
    batch: int,
    rng: jax.Array,
    s: EvalSettings,
    logits_eval: bool = False,
    batch_sharding=None,
) -> EvalOut:
    """One-shot jittable eval match (see module doc for hosted variant)."""
    assert batch % 2 == 0, "eval batch must be even (color halves)"
    body = _make_body(eval_new, eval_old, batch, s, logits_eval)

    def cond(c: EvalCarry):
        return (c.t < s.max_game_length) & jnp.any(~c.states.done)

    out = jax.lax.while_loop(cond, body, _init_carry(batch, rng, batch_sharding))
    return _finalize(out, batch)


def make_hosted_eval(
    net,
    batch: int,
    s: EvalSettings,
    batch_sharding=None,
    plies_per_segment: int = 16,
    *,
    net_old=None,
    select_new: Callable | None = None,
    select_old: Callable | None = None,
    search_new: Callable | None = None,
    search_old: Callable | None = None,
):
    """Host-driven eval: returns ``run(vars_new, vars_old, rng) -> EvalOut``
    with bounded device programs (carry donated between segments).

    ``net_old`` (default: ``net``) lets the two halves run different
    topologies; ``select_new``/``select_old`` override the greedy action
    pick per half (see _make_body) — together these are the hooks the
    arena strength-match driver (arena.py) is built on.

    Multi-host: same lockstep-SPMD posture as make_hosted_selfplay —
    liveness check and final outputs replicated so every host reads them."""
    assert batch % 2 == 0, "eval batch must be even (color halves)"
    from ..models import policy_logits_fn

    if net_old is None:
        net_old = net

    multihost = jax.process_count() > 1
    repl = (
        NamedSharding(batch_sharding.mesh, PSpec())
        if (multihost and batch_sharding is not None)
        else None
    )
    if multihost and repl is None:
        raise ValueError("multi-host hosted eval requires batch_sharding")

    init_j = jax.jit(
        functools.partial(_init_carry, batch, batch_sharding=batch_sharding)
    )
    alive_j = jax.jit(
        lambda c: jnp.any(~c.states.done), out_shardings=repl
    )

    @functools.partial(jax.jit, donate_argnums=(2,))
    def segment(vars_new, vars_old, carry: EvalCarry) -> EvalCarry:
        body = _make_body(
            policy_logits_fn(net, vars_new),
            policy_logits_fn(net_old, vars_old),
            batch, s, logits_eval=True,
            select_new=select_new, select_old=select_old,
            search_new=search_new, search_old=search_old,
        )
        t_end = jnp.minimum(
            carry.t + plies_per_segment, jnp.int32(s.max_game_length)
        )

        def cond(c: EvalCarry):
            return (c.t < t_end) & jnp.any(~c.states.done)

        return jax.lax.while_loop(cond, body, carry)

    fin_j = jax.jit(functools.partial(_finalize, batch=batch), out_shardings=repl)

    def run(vars_new, vars_old, rng) -> EvalOut:
        if repl is not None:
            from ..parallel.sharding import put_replicated

            rng = put_replicated(batch_sharding.mesh, rng)
        carry = init_j(rng)
        for _ in range(-(-s.max_game_length // plies_per_segment)):
            if not bool(np.asarray(alive_j(carry))):
                break
            carry = segment(vars_new, vars_old, carry)
        return fin_j(carry)

    return run
