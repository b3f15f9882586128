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

Iteration counts default to 12 (gumbel) / 6 (puct) from the MEASURED
steady-state per-iteration costs of the round-3 arms themselves
(gumbel: ~59.5 s/iter ex-first-compile; puct: ~117 s/iter); ACTUAL
wall-clocks AND steady-state per-iter costs are recorded in result.json —
the match is judged on them, not the plan.

Resilience (round-3 postmortem: a tunnel outage zeroed the PUCT arm):
each arm trains under the framework's own --auto-restart supervisor with
--save-interval 1, so a crash mid-arm resumes from the last completed
iteration instead of restarting from scratch; an arm whose final
checkpoint already exists is skipped entirely (wall derived from its
training_stats.json).

Usage: python scripts/h2h_gumbel_puct.py [--gumbel-iters 12] [--puct-iters 6]
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
        # per-iteration checkpoints + crash supervisor: one tunnel outage
        # costs at most the current iteration, never the arm
        "--save-interval", "1",
        "--auto-restart", "5",
        "--checkpoint-replay", "0",
        "--seed", str(seed),
        "--checkpoint-dir", out_dir,
    ]
    t0 = time.perf_counter()
    subprocess.run(cmd, check=True)
    return time.perf_counter() - t0


def _stats_walls(out_dir: str, iters: int):
    """(total_wall_s, steady_s_per_iter) from an arm's training_stats.json.

    Used when the arm trained in an earlier invocation (skip-if-complete) —
    per-iteration walls are authoritative there. Steady-state excludes
    iteration 1, which carries the one-time XLA compile."""
    path = os.path.join(out_dir, "training_stats.json")
    if not os.path.exists(path):
        return None, None
    with open(path) as f:
        stats = json.load(f)
    times = [e["time"] for e in stats[:iters]]
    if not times:
        return None, None
    steady = sum(times[1:]) / max(1, len(times) - 1) if len(times) > 1 else times[0]
    return round(sum(times), 1), round(steady, 1)


def _arm_complete(out_dir: str, iters: int) -> bool:
    return os.path.isdir(os.path.join(out_dir, f"checkpoint_iter{iters}"))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--gumbel-iters", type=int, default=12)
    p.add_argument("--puct-iters", type=int, default=6)
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
    arms = [("gumbel", g_dir, "gumbel", 32, args.gumbel_iters),
            ("puct", p_dir, "puct", 200, args.puct_iters)]
    for name, out_dir, algo, sims, iters in arms:
        if args.skip_train or _arm_complete(out_dir, iters):
            total, steady = _stats_walls(out_dir, iters)
            if args.skip_train and not _arm_complete(out_dir, iters):
                sys.exit(
                    f"h2h: --skip-train but {out_dir}/checkpoint_iter{iters} "
                    f"is missing — train the {name} arm first (drop "
                    f"--skip-train or lower --{name}-iters)")
            print(f"[h2h] {name} arm complete ({out_dir}/checkpoint_iter"
                  f"{iters}); wall from stats: {total}s", flush=True)
            walls[f"{name}_s"] = total
            walls[f"{name}_steady_s_per_iter"] = steady
        else:
            _train(out_dir, algo, sims, iters, args.seed)
            # per-iteration stats are authoritative (a resumed arm's
            # subprocess wall covers only the remaining iterations, and a
            # supervisor backend-wait is not training cost)
            walls[f"{name}_s"], walls[f"{name}_steady_s_per_iter"] = (
                _stats_walls(out_dir, iters))

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
        path = os.path.join(ckpt_dir, f"checkpoint_iter{it}")
        if not os.path.isdir(path):
            have = sorted(
                int(n.rsplit("iter", 1)[1]) for n in os.listdir(ckpt_dir)
                if n.startswith("checkpoint_iter")
            ) if os.path.isdir(ckpt_dir) else []
            sys.exit(f"h2h: {path} missing (completed iterations: {have}) "
                     f"— rerun without --skip-train to finish the arm")
        restored = ckpt.load_checkpoint(path)
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
                   "wall_s": walls.get("gumbel_s"),
                   "steady_s_per_iter": walls.get("gumbel_steady_s_per_iter")},
        "puct": {"iters": args.puct_iters, "sims": 200,
                 "wall_s": walls.get("puct_s"),
                 "steady_s_per_iter": walls.get("puct_steady_s_per_iter")},
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
