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
    # per-side search: "puct" (reference semantics) or "gumbel" (the
    # sequential-halving root, search/gumbel.py). Per-side budgets default
    # to num_simulations — together these express the strength-per-compute
    # matches the gumbel mode exists for (e.g. gumbel-32 vs puct-200).
    algo_a: str = "puct"
    algo_b: str = "puct"
    sims_a: int = 0            # 0 -> num_simulations
    sims_b: int = 0
    max_considered: int = 16   # gumbel m


def _sampler(batch_half: int, temperature: float):
    temp = jnp.full((batch_half,), temperature, jnp.float32)
    return lambda res, k: M.sample_actions(res, temp, k)


def _side_hooks(algo: str, sims: int, s: ArenaSettings, batch_half: int):
    """(search_fn, select_fn) for one side. The gumbel side acts its
    halving winner — the per-ply Gumbel sample already provides the game
    variety the PUCT side gets from temperature sampling."""
    if algo == "gumbel":
        from ..search import gumbel as G

        gcfg = G.GumbelConfig(
            num_simulations=sims,
            max_considered=min(s.max_considered, s.max_children),
            max_children=s.max_children,
        )
        return (
            lambda ev, st, k: G.run_gumbel_mcts(ev, st, k, gcfg,
                                                logits_eval=True),
            lambda res, k: res.chosen,
        )
    mcfg = M.MCTSConfig(
        num_simulations=sims, c_puct=s.c_puct, max_children=s.max_children
    )
    return (
        lambda ev, st, k: M.run_mcts(ev, st, k, mcfg, add_noise=False,
                                     logits_eval=True),
        _sampler(batch_half, s.temperature),
    )


def make_hosted_arena(net_a, net_b, batch: int, s: ArenaSettings,
                      plies_per_segment: int = 16):
    """Host-driven arena: run(vars_a, vars_b, rng) -> dict of counts.
    ``net_a``/``net_b`` may be different topologies, searches, budgets."""
    assert batch % 2 == 0, "arena batch must be even (color halves)"
    sims_a = s.sims_a or s.num_simulations
    sims_b = s.sims_b or s.num_simulations
    es = EvalSettings(
        num_simulations=s.num_simulations,
        c_puct=s.c_puct,
        max_children=s.max_children,
        max_game_length=s.max_game_length,
    )
    search_a, sel_a = _side_hooks(s.algo_a, sims_a, s, batch // 2)
    search_b, sel_b = _side_hooks(s.algo_b, sims_b, s, batch // 2)
    eval_run = make_hosted_eval(
        net_a, batch, es, plies_per_segment=plies_per_segment,
        net_old=net_b, select_new=sel_a, select_old=sel_b,
        search_new=search_a, search_old=search_b,
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
    p.add_argument("--algo-a", choices=["puct", "gumbel"], default="puct")
    p.add_argument("--algo-b", choices=["puct", "gumbel"], default="puct")
    p.add_argument("--sims-a", type=int, default=0,
                   help="side-a simulation budget (default --sims)")
    p.add_argument("--sims-b", type=int, default=0)
    args = p.parse_args(argv)

    pa, pb = Predictor.load(args.a), Predictor.load(args.b)
    s = ArenaSettings(
        num_simulations=args.sims,
        temperature=args.temperature,
        max_game_length=args.max_game_length,
        algo_a=args.algo_a, algo_b=args.algo_b,
        sims_a=args.sims_a, sims_b=args.sims_b,
    )
    batch = args.games + args.games % 2
    run = make_hosted_arena(pa.net, pb.net, batch, s)
    out = run(pa.variables, pb.variables, jax.random.key(args.seed))
    out["a"], out["b"] = args.a, args.b
    out["sims"], out["temperature"] = args.sims, args.temperature
    out["algo_a"], out["algo_b"] = args.algo_a, args.algo_b
    if args.sims_a or args.sims_b:
        out["sims_a"] = args.sims_a or args.sims
        out["sims_b"] = args.sims_b or args.sims
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
