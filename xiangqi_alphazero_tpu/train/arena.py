"""Model-vs-model arena: pit two checkpoints over a batch of games.

The gated-eval driver (evaluate.py) is deliberately deterministic
(temperature 0, no noise — reference train.py:478-496), which is right for
promotion gating but useless for STRENGTH MATCHES from a single start
position: every game in a color half would be identical. The arena plays
the same lockstep color-halved batch but samples moves at a small
temperature with per-game RNG streams, which is how the published model
cards measure Elo-style progress (models/README.md).

The correctness-critical match machinery (color-half ordering, half swap,
bounded donated segments) lives ONCE in evaluate.py — this module only
supplies the temperature samplers and the two (possibly different-topology)
nets through make_hosted_eval's hooks.

CLI:
    python -m xiangqi_alphazero_tpu.train.arena \
        --a models/continued_run/best_model --b models/pretrained/best_model \
        --games 32 --sims 40 --temperature 0.2
Prints one JSON line {a_wins, b_wins, draws, ...}.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..search import mcts as M
from .evaluate import EvalSettings, make_hosted_eval


class ArenaSettings(NamedTuple):
    num_simulations: int = 40
    c_puct: float = 1.5
    max_children: int = 128
    max_game_length: int = 300
    temperature: float = 0.2


def _sampler(batch_half: int, temperature: float):
    temp = jnp.full((batch_half,), temperature, jnp.float32)
    return lambda res, k: M.sample_actions(res, temp, k)


def make_hosted_arena(net_a, net_b, batch: int, s: ArenaSettings,
                      plies_per_segment: int = 16):
    """Host-driven arena: run(vars_a, vars_b, rng) -> dict of counts.
    ``net_a``/``net_b`` may be different topologies."""
    assert batch % 2 == 0, "arena batch must be even (color halves)"
    es = EvalSettings(
        num_simulations=s.num_simulations,
        c_puct=s.c_puct,
        max_children=s.max_children,
        max_game_length=s.max_game_length,
    )
    sel = _sampler(batch // 2, s.temperature)
    eval_run = make_hosted_eval(
        net_a, batch, es, plies_per_segment=plies_per_segment,
        net_old=net_b, select_new=sel, select_old=sel,
    )

    def run(vars_a, vars_b, rng) -> dict:
        out = eval_run(vars_a, vars_b, rng)
        a_w = int(np.asarray(out.new_wins))
        b_w = int(np.asarray(out.old_wins))
        return {
            "games": batch,
            "a_wins": a_w,
            "b_wins": b_w,
            "draws": int(np.asarray(out.draws)),
            "avg_plies": float(np.asarray(out.avg_plies)),
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
