"""Gumbel-32 vs PUCT-200 matched-wall-clock training head-to-head.

The framework's marquee efficiency claim (train/selfplay.py: gumbel mode)
is that Gumbel sequential-halving at 32 sims/move trains at a fraction of
PUCT-200's self-play cost at comparable strength-per-wall-clock — it
replaces the reference's only efficiency lever (the socket inference
server, reference: training/inference_server.py:145-277) with an
algorithmic one. This script MEASURES that claim:

1. trains two tpu-preset (128ch/6res) models from the same seed/init,
   one arm per search algorithm, with iteration counts sized so both
   arms get the same wall-clock budget (no gated eval in either arm —
   every second goes to self-play + SGD, symmetrically);
2. arenas the two products with a NEUTRAL evaluator (40-sim PUCT both
   sides, temperature 0.2, alternating colors, the models/README ladder
   protocol);
3. prints a markdown row for models/README.md plus one JSON line, and
   writes models/h2h/result.json.

Iteration counts default to 12 (gumbel) / 5 (puct) from the measured
per-iteration costs of the recorded runs (elo_run: ~45 s/iter ex-eval;
pretrained: ~110 s/iter ex-eval); ACTUAL wall-clocks per arm are measured
and reported — the match is judged on them, not the plan.

Usage: python scripts/h2h_gumbel_puct.py [--gumbel-iters 12] [--puct-iters 5]
           [--games 64] [--seed 11] [--out models/h2h]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _train(out_dir: str, algo: str, sims: int, iters: int, seed: int) -> float:
    cmd = [
        sys.executable, "-m", "xiangqi_alphazero_tpu.train",
        "--mode", "tpu",
        "--search-algo", algo,
        "--simulations", str(sims),
        "--games-per-iter", "256",
        "--iterations", str(iters),
        "--eval-interval", "100000",
        "--save-interval", str(iters),
        "--checkpoint-replay", "0",
        "--seed", str(seed),
        "--checkpoint-dir", out_dir,
    ]
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True)
    return time.perf_counter() - t0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--gumbel-iters", type=int, default=12)
    p.add_argument("--puct-iters", type=int, default=5)
    p.add_argument("--games", type=int, default=64)
    p.add_argument("--arena-sims", type=int, default=40)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--out", default="models/h2h")
    p.add_argument("--skip-train", action="store_true",
                   help="reuse existing checkpoints, only re-run the arena")
    args = p.parse_args()

    g_dir = os.path.join(args.out, "gumbel")
    p_dir = os.path.join(args.out, "puct")
    walls = {}
    if not args.skip_train:
        walls["gumbel_s"] = round(
            _train(g_dir, "gumbel", 32, args.gumbel_iters, args.seed), 1)
        walls["puct_s"] = round(
            _train(p_dir, "puct", 200, args.puct_iters, args.seed), 1)

    # --- arena the CURRENT params of the final checkpoints (gated eval is
    # off in both arms, so best_params would still be the shared init) ----
    import jax
    import numpy as np

    from xiangqi_alphazero_tpu.models import XiangqiNet
    from xiangqi_alphazero_tpu.train import checkpoint as ckpt
    from xiangqi_alphazero_tpu.train.arena import ArenaSettings, make_hosted_arena
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    def _load(ckpt_dir: str, it: int):
        restored = ckpt.load_checkpoint(
            os.path.join(ckpt_dir, f"checkpoint_iter{it}"))
        mc = restored["config"]
        net = XiangqiNet(channels=int(mc["num_channels"]),
                         blocks=int(mc["num_res_blocks"]))
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        return net, jax.tree.map(np.asarray, variables)

    net_g, vars_g = _load(g_dir, args.gumbel_iters)
    net_p, vars_p = _load(p_dir, args.puct_iters)

    batch = args.games + args.games % 2
    s = ArenaSettings(num_simulations=args.arena_sims, temperature=0.2)
    run = make_hosted_arena(net_g, net_p, batch, s)
    res = run(vars_g, vars_p, jax.random.key(args.seed))

    out = {
        "gumbel": {"iters": args.gumbel_iters, "sims": 32,
                   "wall_s": walls.get("gumbel_s")},
        "puct": {"iters": args.puct_iters, "sims": 200,
                 "wall_s": walls.get("puct_s")},
        "arena": res,
        "arena_protocol": {"sims": args.arena_sims, "algo": "puct both",
                           "temperature": 0.2, "games": batch},
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "result.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"| gumbel-32 x{args.gumbel_iters} it | puct-200 x{args.puct_iters} it "
          f"| {res['a_wins']}-{res['b_wins']}-{res['draws']} "
          f"(gumbel score {res['a_score']:.2f}) |")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
