"""Summarize a strength run: Elo ladder x training-dynamics table.

Joins models/<run>/training_stats.json with a ladder JSON (the output of
python -m xiangqi_alphazero_tpu.train.elo) and prints a markdown table of
iteration -> Elo, policy/value loss, average game length, draw rate —
the evidence table for the 200-iteration curve and the value-loss-rise
explanation (round-3 verdict item 7).

  python scripts/strength_report.py --run models/elo_run \
      --ladder models/elo_ladder_r04.json
"""

import argparse
import json
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--run", default="models/elo_run")
    p.add_argument("--ladder", default=None)
    p.add_argument("--window", type=int, default=5,
                   help="average training metrics over the last N "
                        "iterations up to each snapshot")
    args = p.parse_args()

    with open(os.path.join(args.run, "training_stats.json")) as f:
        stats = json.load(f)
    by_iter = {e["iteration"]: e for e in stats}

    ratings = {}
    if args.ladder and os.path.exists(args.ladder):
        with open(args.ladder) as f:
            ladder = json.load(f)
        for path, elo in ladder["ratings"].items():
            base = os.path.basename(path.rstrip("/"))
            if base.startswith("checkpoint_iter"):
                ratings[int(base[len("checkpoint_iter"):])] = elo
            elif "iter0" in path:
                ratings[0] = elo

    snaps = sorted(ratings) if ratings else sorted(
        i for i in by_iter if i % 20 == 0
    )

    def window_avg(it, key_path):
        vals = []
        for j in range(max(1, it - args.window + 1), it + 1):
            e = by_iter.get(j)
            if e is None:
                continue
            d = e
            for k in key_path:
                d = d.get(k, {})
            if isinstance(d, (int, float)):
                vals.append(d)
        return sum(vals) / len(vals) if vals else None

    print("| iteration | Elo | policy loss | value loss | avg plies | "
          "draw rate |")
    print("|---|---|---|---|---|---|")
    for it in snaps:
        elo = f"{ratings[it]:.0f}" if it in ratings else "-"
        if it == 0:
            print(f"| 0 | {elo} | - | - | - | - |")
            continue
        pl = window_avg(it, ("training", "policy_loss"))
        vl = window_avg(it, ("training", "value_loss"))
        plies = window_avg(it, ("self_play", "avg_steps"))
        e = by_iter.get(it, {})
        sp = e.get("self_play", {})
        games = sp.get("games", 0)
        dr = sp.get("draws", 0) / games if games else None
        row = [
            str(it), elo,
            f"{pl:.3f}" if pl is not None else "-",
            f"{vl:.3f}" if vl is not None else "-",
            f"{plies:.0f}" if plies is not None else "-",
            f"{dr:.2f}" if dr is not None else "-",
        ]
        print("| " + " | ".join(row) + " |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
