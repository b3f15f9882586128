"""Gated model evaluation: candidate vs incumbent, alternating colors.

Reference semantics (training/train.py:449-535): eval_games matches, the
candidate takes red in even-indexed games, temperature 0 and no root noise,
eval_simulations per move; a game not finished at max_game_length is a draw
(train.py:494-496 — NO material adjudication here, unlike self-play);
win_rate = (wins + 0.5*draws) / games, promotion at >= eval_win_rate.

TPU-native: all eval games run in one lockstep batch; each ply both models
search the full batch and the per-game mover's result is selected.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

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


def evaluate_pair(
    eval_new: Callable,
    eval_old: Callable,
    batch: int,
    rng: jax.Array,
    s: EvalSettings,
    logits_eval: bool = False,
    batch_sharding=None,
) -> EvalOut:
    mcfg = M.MCTSConfig(
        num_simulations=s.num_simulations,
        c_puct=s.c_puct,
        max_children=s.max_children,
    )
    states = E.reset_batch(batch)
    if batch_sharding is not None:
        states = jax.lax.with_sharding_constraint(states, batch_sharding)
    new_is_red = (jnp.arange(batch) % 2) == 0

    class Carry(NamedTuple):
        states: E.EnvState
        t: jax.Array
        rng: jax.Array

    def cond(c: Carry):
        return (c.t < s.max_game_length) & jnp.any(~c.states.done)

    def greedy(res: M.SearchResult) -> jax.Array:
        slot = jnp.argmax(
            jnp.where(res.valid, res.visits, -1), axis=-1
        )
        return jnp.take_along_axis(res.actions, slot[:, None], axis=-1).squeeze(-1)

    def body(c: Carry) -> Carry:
        rng, k1, k2 = jax.random.split(c.rng, 3)
        res_new = M.run_mcts(
            eval_new, c.states, k1, mcfg, add_noise=False,
            logits_eval=logits_eval,
        )
        res_old = M.run_mcts(
            eval_old, c.states, k2, mcfg, add_noise=False,
            logits_eval=logits_eval,
        )
        new_to_move = (c.states.side == 1) == new_is_red
        act = jnp.where(new_to_move, greedy(res_new), greedy(res_old))
        return Carry(states=E.v_step(c.states, act), t=c.t + 1, rng=rng)

    out = jax.lax.while_loop(
        cond, body, Carry(states=states, t=jnp.int32(0), rng=rng)
    )
    winners = jnp.where(out.states.done, out.states.winner, 0).astype(jnp.int8)

    new_won = ((winners == 1) & new_is_red) | ((winners == -1) & ~new_is_red)
    old_won = ((winners == -1) & new_is_red) | ((winners == 1) & ~new_is_red)
    return EvalOut(
        new_wins=jnp.sum(new_won.astype(jnp.int32)),
        old_wins=jnp.sum(old_won.astype(jnp.int32)),
        draws=jnp.sum((winners == 0).astype(jnp.int32)),
        winners=winners,
        new_is_red=new_is_red,
    )
