"""Model-vs-model arena: pit two checkpoints over a batch of games.

The gated-eval driver (evaluate.py) is deliberately deterministic
(temperature 0, no noise — reference train.py:478-496), which is right for
promotion gating but useless for STRENGTH MATCHES from a single start
position: every game in a color half would be identical. The arena plays
the same lockstep color-halved batch but samples moves at a small
temperature with per-game RNG streams, which is how the published model
cards measure Elo-style progress (models/README.md).

CLI:
    python -m xiangqi_alphazero_tpu.train.arena \
        --a models/continued_run/best_model --b models/pretrained/best_model \
        --games 32 --sims 40 --temperature 0.2
Prints one JSON line {a_wins, b_wins, draws, ...}.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..engine import env as E
from ..search import mcts as M


class ArenaSettings(NamedTuple):
    num_simulations: int = 40
    c_puct: float = 1.5
    max_children: int = 128
    max_game_length: int = 300
    temperature: float = 0.2


class ArenaCarry(NamedTuple):
    states: E.EnvState
    t: jax.Array
    rng: jax.Array


def _init_carry(batch: int, rng: jax.Array) -> ArenaCarry:
    return ArenaCarry(states=E.reset_batch(batch), t=jnp.int32(0), rng=rng)


def _make_body(eval_a, eval_b, batch: int, s: ArenaSettings):
    half = batch // 2
    mcfg = M.MCTSConfig(
        num_simulations=s.num_simulations,
        c_puct=s.c_puct,
        max_children=s.max_children,
    )

    def swap_halves(tree):
        return jax.tree.map(
            lambda x: jnp.concatenate([x[half:], x[:half]], axis=0), tree
        )

    def body(c: ArenaCarry) -> ArenaCarry:
        rng, k1, k2, ka, kb = jax.random.split(c.rng, 5)
        # A is red in the first half; red moves at even plies (lockstep, no
        # openings) — order the batch so the mover's games come first and
        # search each half with only its model (see evaluate.py)
        a_first = (c.t % 2) == 0
        ordered = jax.lax.cond(a_first, lambda x: x, swap_halves, c.states)
        top = jax.tree.map(lambda x: x[:half], ordered)
        bot = jax.tree.map(lambda x: x[half:], ordered)
        res_a = M.run_mcts(eval_a, top, k1, mcfg, add_noise=False,
                           logits_eval=True)
        res_b = M.run_mcts(eval_b, bot, k2, mcfg, add_noise=False,
                           logits_eval=True)
        temp = jnp.full((half,), s.temperature, jnp.float32)
        act_ordered = jnp.concatenate([
            M.sample_actions(res_a, temp, ka),
            M.sample_actions(res_b, temp, kb),
        ])
        act = jax.lax.cond(a_first, lambda a: a, swap_halves, act_ordered)
        return ArenaCarry(states=E.v_step(c.states, act), t=c.t + 1, rng=rng)

    return body


def make_hosted_arena(net_a, net_b, batch: int, s: ArenaSettings,
                      plies_per_segment: int = 16):
    """Host-driven arena: run(vars_a, vars_b, rng) -> dict of counts.
    ``net_a``/``net_b`` may be different topologies."""
    assert batch % 2 == 0, "arena batch must be even (color halves)"
    from ..models import policy_logits_fn

    init_j = jax.jit(functools.partial(_init_carry, batch))
    alive_j = jax.jit(lambda c: jnp.any(~c.states.done))

    @functools.partial(jax.jit, donate_argnums=(2,))
    def segment(vars_a, vars_b, carry: ArenaCarry) -> ArenaCarry:
        body = _make_body(
            policy_logits_fn(net_a, vars_a),
            policy_logits_fn(net_b, vars_b),
            batch, s,
        )
        t_end = jnp.minimum(
            carry.t + plies_per_segment, jnp.int32(s.max_game_length)
        )

        def cond(c):
            return (c.t < t_end) & jnp.any(~c.states.done)

        return jax.lax.while_loop(cond, body, carry)

    def run(vars_a, vars_b, rng) -> dict:
        carry = init_j(rng)
        for _ in range(-(-s.max_game_length // plies_per_segment)):
            if not bool(np.asarray(alive_j(carry))):
                break
            carry = segment(vars_a, vars_b, carry)
        half = batch // 2
        done = np.asarray(carry.states.done)
        winners = np.where(done, np.asarray(carry.states.winner), 0)
        a_red = np.arange(batch) < half
        a_w = int(((winners == 1) & a_red).sum()
                  + ((winners == -1) & ~a_red).sum())
        b_w = int(((winners == -1) & a_red).sum()
                  + ((winners == 1) & ~a_red).sum())
        return {
            "games": batch,
            "a_wins": a_w,
            "b_wins": b_w,
            "draws": int(batch - a_w - b_w),
            "avg_plies": float(np.asarray(carry.states.ply).mean()),
            "a_score": (a_w + 0.5 * (batch - a_w - b_w)) / batch,
        }

    return run


def main(argv=None) -> int:
    import argparse
    import json

    from ..serve.predictor import Predictor
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser(description="model-vs-model arena")
    p.add_argument("--a", required=True, help="checkpoint (best_model dir or .pt)")
    p.add_argument("--b", required=True)
    p.add_argument("--games", type=int, default=32)
    p.add_argument("--sims", type=int, default=40)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--max-game-length", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    pa, pb = Predictor.load(args.a), Predictor.load(args.b)
    s = ArenaSettings(
        num_simulations=args.sims,
        temperature=args.temperature,
        max_game_length=args.max_game_length,
    )
    batch = args.games + args.games % 2
    run = make_hosted_arena(pa.net, pb.net, batch, s)
    out = run(pa.variables, pb.variables, jax.random.key(args.seed))
    out["a"], out["b"] = args.a, args.b
    out["sims"], out["temperature"] = args.sims, args.temperature
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
