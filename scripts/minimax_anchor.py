"""External Elo anchor: checkpoint nets vs the native alpha-beta minimax.

The repo's Elo ladder (models/elo_ladder_r03.json) is self-referential —
every rating is this run's snapshots rated by this repo's own arena. This
script pins the scale to an ABSOLUTE opponent: the material alpha-beta
minimax at a fixed depth, the same evaluation/search the reference ships
to humans (its web app's 4 AI levels ARE minimax lookahead plies 0-3,
reference: web/client/src/hooks/useXiangqi.ts:9,
xiangqi-engine.ts:292-357; our C++ implementation:
engine/native/xq_core.cpp xq_minimax_move, bit-compatible with
serve/static/engine.js).

DEPTH <-> REFERENCE-LEVEL MAPPING (off-by-one, deliberate): our
xq_minimax_move(depth=D) scores each root move with -negamax(D) — D+1
plies of total lookahead — while the reference's getAIMove(level) scores
with -minimax(level-1) — `level` plies total (xiangqi-engine.ts:328; its
level 0 is a RANDOM mover, ts:318). So --depth D here plays the
reference's web level D+1:
    --depth 1  == reference level 2 (its default difficulty)
    --depth 2  == reference level 3 (its MAXIMUM difficulty)
    --depth 3  ==  one ply beyond anything the reference ships
(our serve/static/index.html applies the same `localLevel - 1` shift).
Anchor JSONs store the raw --depth; read them with this table. One
further small divergence from the reference web AI, shared deliberately
with the engine.js twin: negamax scores a no-legal-move position at the
depth-0 horizon as material rather than mate (the reference checks
game-over at every node); mates are still found one ply earlier via king
capture (king = 10000), so this only softens horizon-exact stalemates.

Protocol per (model, depth): --games games, net plays red in the first
half and black in the second; net side = greedy 200-sim PUCT search
(temp 0, no noise — the serving configuration) batched on device across
all live games; minimax side = native xq_minimax_move with a per-move
deterministic seed. Rules/termination are the host oracle's (exact
reference semantics incl. repetition + material adjudication).

Output: one JSON line per model with W-D-L, score, and the implied Elo
gap vs the anchor (400*log10(s/(1-s))), plus models/anchor_r04.json.

Usage:
  python scripts/minimax_anchor.py --models models/elo_run/checkpoint_iter120 \
      [models/elo_run/checkpoint_iter60 ...] --depth 3 --games 64
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def play_match(
    pred, depth: int, games: int, base_seed: int = 17,
    epsilon: float = 0.0,
) -> dict:
    """One anchor cell. ``epsilon`` > 0 makes the minimax side an
    INTERMEDIATE opponent: with probability epsilon per move it plays a
    uniformly random legal move instead of its minimax move (deterministic
    per-move coin from the same seed stream). The round-4 anchor table had
    no resolution between depth-1 (score 0.55) and depth-2 (floor at
    ~0.11); an epsilon-ladder at depth 2 (e.g. 0.5 / 0.25 / 0.1) grades
    that gap so progress moves a number instead of sitting on a floor
    (VERDICT round-4 item 3)."""
    from xiangqi_alphazero_tpu.engine import native
    from xiangqi_alphazero_tpu.engine.oracle import Position

    assert native.available(), "native core required for the minimax anchor"

    pos = [Position() for _ in range(games)]
    net_side = [1 if g < (games + 1) // 2 else -1 for g in range(games)]
    winner = [None] * games  # +1 red, -1 black, 0 draw
    move_seed = base_seed

    while any(w is None for w in winner):
        # settle terminals first (covers positions reached by either side)
        for g in range(games):
            if winner[g] is None:
                done, w = pos[g].result()
                if done:
                    winner[g] = w
        # --- net moves, one fused device search over all its live turns ---
        net_turn = [g for g in range(games)
                    if winner[g] is None and pos[g].side == net_side[g]]
        if net_turn:
            results = pred.search_batch(
                [pos[g] for g in net_turn], pad_to=games)
            for g, res in zip(net_turn, results):
                actions, visits, order = res[0], res[1], res[2]
                if len(res) > 3:  # gumbel: the halving winner acts
                    a = int(res[3])
                else:
                    # greedy = max visits; ties broken by movegen
                    # precedence (the reference's argmax-first semantics)
                    top = visits == visits.max()
                    masked = np.where(top, order, np.iinfo(np.int32).max)
                    a = int(actions[int(np.argmin(masked))])
                pos[g].apply(a)
                done, w = pos[g].result()
                if done:
                    winner[g] = w
        # --- minimax moves (host, native core; the ctypes call releases
        # the GIL, so a thread pool runs the per-game searches on all
        # cores) -----------------------------------------------------------
        mm_turn = [g for g in range(games)
                   if winner[g] is None and pos[g].side != net_side[g]]
        if mm_turn:
            from concurrent.futures import ThreadPoolExecutor

            seeds = {}
            for g in mm_turn:
                move_seed += 1
                seeds[g] = move_seed

            def _mm(g):
                if epsilon > 0.0:
                    # deterministic per-move blunder coin + random-move
                    # draw from the same seed stream as the tie-breaks
                    r = np.random.default_rng(seeds[g])
                    if r.random() < epsilon:
                        legal = pos[g].legal_actions()
                        if not legal:
                            return g, None
                        return g, int(legal[r.integers(len(legal))])
                return g, native.minimax_move(
                    pos[g].board_array(), pos[g].side, depth, seed=seeds[g])

            with ThreadPoolExecutor(max_workers=min(32, len(mm_turn))) as ex:
                results_mm = list(ex.map(_mm, mm_turn))
            for g, a in results_mm:
                if a is None:  # no legal move: side to move loses
                    winner[g] = -pos[g].side
                    continue
                pos[g].apply(a)
                done, w = pos[g].result()
                if done:
                    winner[g] = w

    wins = sum(1 for g in range(games) if winner[g] == net_side[g])
    losses = sum(1 for g in range(games) if winner[g] == -net_side[g])
    draws = games - wins - losses
    score = (wins + 0.5 * draws) / games
    s = min(max(score, 1 / (2 * games)), 1 - 1 / (2 * games))  # finite Elo
    return {
        "net_wins": wins, "draws": draws, "net_losses": losses,
        "score": round(score, 4),
        "elo_vs_anchor": round(400.0 * math.log10(s / (1.0 - s)), 1),
        "avg_plies": round(float(np.mean([p.ply for p in pos])), 1),
    }


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--models", nargs="+", required=True,
                   help="orbax checkpoint dirs (or .pt files)")
    p.add_argument("--depth", type=int, default=3,
                   help="search depth D after the root move (D+1 plies "
                        "total = reference web AI level D+1; see module "
                        "docstring)")
    p.add_argument("--games", type=int, default=64)
    p.add_argument("--sims", type=int, default=200)
    p.add_argument("--algo", default="puct", choices=["puct", "gumbel"])
    p.add_argument("--epsilon", type=float, default=0.0,
                   help="per-move probability the minimax side plays a "
                        "random legal move instead (graded intermediate "
                        "opponents between depth levels; 0 = pure minimax)")
    p.add_argument("--out", default="models/anchor_r05.json")
    args = p.parse_args()

    from xiangqi_alphazero_tpu.serve.predictor import Predictor
    from xiangqi_alphazero_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    results = []
    for path in args.models:
        pred = Predictor.load(path, num_simulations=args.sims, algo=args.algo)
        t0 = time.perf_counter()
        r = play_match(pred, args.depth, args.games, epsilon=args.epsilon)
        r.update(model=path, depth=args.depth, games=args.games,
                 sims=args.sims, algo=args.algo, epsilon=args.epsilon,
                 wall_s=round(time.perf_counter() - t0, 1))
        results.append(r)
        print(json.dumps(r), flush=True)

    eps_note = (
        f" with epsilon={args.epsilon} random-move blunder rate"
        if args.epsilon > 0 else ""
    )
    out = {"protocol": {
        "anchor": f"alpha-beta minimax depth {args.depth} "
                  f"(= {args.depth + 1} plies total = reference web AI "
                  f"level {args.depth + 1}; native xq_core, "
                  "engine.js-compatible material eval)" + eps_note,
        "net_search": f"{args.algo}-{args.sims} temp 0 greedy",
        "colors": "net red first half, black second half",
    }, "results": results}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
