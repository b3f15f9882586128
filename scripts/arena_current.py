"""Neutral arena over FULL training checkpoints' CURRENT params.

`train.arena`'s Predictor loader prefers best_params — correct for gated
runs, wrong for experiment arms trained with gating off (best_params is
still the shared init there). This loads checkpoint_iterN's CURRENT
params like the h2h driver does and runs the standard neutral protocol
(40-sim PUCT both sides, temp 0.2, alternating colors).

  python scripts/arena_current.py --a models/h2h/pcap/checkpoint_iter14 \
      --b models/h2h/gumbel/checkpoint_iter12 [--games 64] [--sims 40]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_current(path: str):
    import jax
    import numpy as np

    from xiangqi_alphazero_tpu.models import XiangqiNet
    from xiangqi_alphazero_tpu.train import checkpoint as ckpt

    restored = ckpt.load_checkpoint(path)
    mc = restored["config"]
    net = XiangqiNet(channels=int(mc["num_channels"]),
                     blocks=int(mc["num_res_blocks"]))
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
    return net, jax.tree.map(np.asarray, variables)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--a", required=True)
    p.add_argument("--b", required=True)
    p.add_argument("--games", type=int, default=64)
    p.add_argument("--sims", type=int, default=40)
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=11)
    args = p.parse_args()

    import jax

    from xiangqi_alphazero_tpu.train.arena import (
        ArenaSettings, make_hosted_arena,
    )
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    net_a, vars_a = load_current(args.a)
    net_b, vars_b = load_current(args.b)
    batch = args.games + args.games % 2
    s = ArenaSettings(num_simulations=args.sims,
                      temperature=args.temperature)
    run = make_hosted_arena(net_a, net_b, batch, s)
    res = run(vars_a, vars_b, jax.random.key(args.seed))
    print(json.dumps({"a": args.a, "b": args.b, **res,
                      "sims": args.sims, "games": batch}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
