#!/usr/bin/env bash
# Round-5 post-flagship measurement sequence (chip-exclusive; run only
# after the flagship training process has exited). Each phase appends its
# JSON to models/; safe to re-run phase by phase.
#
#   bash scripts/round5_post.sh int8      # on-chip int8 probe (~20 min)
#   bash scripts/round5_post.sh h2h       # gumbel-vs-puct sensitivity cells
#   bash scripts/round5_post.sh anchor    # flagship + old nets vs minimax
#   bash scripts/round5_post.sh ladder    # cross-round Elo ladder
#   bash scripts/round5_post.sh guards    # GUARDS_r05.json
set -e
cd "$(dirname "$0")/.."
FLAG=models/flagship/best_model

case "$1" in
int8)
  python scripts/int8_probe.py 2>/dev/null | tee models/int8_probe_r05.json
  ;;
h2h)
  # Sensitivity cells for the round-4 gumbel-vs-puct headline (0.664 at
  # 40-sim temp-0.2): vary sims and temperature separately. Literal
  # temp-0 is DEGENERATE under this deterministic evaluator (all
  # same-color games are identical — the gate quantizes to quarters, see
  # ROUND5.md), so the confirming cells use 200-sim/temp-0.2 and
  # 40-sim/temp-0.05.
  python -m xiangqi_alphazero_tpu.train.arena \
    --a models/h2h/gumbel/best_model --b models/h2h/puct/best_model \
    --games 64 --sims 200 --temperature 0.2 --seed 11 \
    2>/dev/null | tail -1 | tee models/h2h/confirm_200sim.json
  python -m xiangqi_alphazero_tpu.train.arena \
    --a models/h2h/gumbel/best_model --b models/h2h/puct/best_model \
    --games 64 --sims 40 --temperature 0.05 --seed 12 \
    2>/dev/null | tail -1 | tee models/h2h/confirm_lowtemp.json
  ;;
anchor)
  # flagship vs the absolute scale (depth D = reference level D+1)
  python scripts/minimax_anchor.py --models "$FLAG" \
    --depth 1 --games 64 --out models/anchor_r05_d1.json 2>/dev/null
  python scripts/minimax_anchor.py --models "$FLAG" \
    --depth 2 --games 64 --out models/anchor_r05_d2.json 2>/dev/null
  python scripts/minimax_anchor.py --models "$FLAG" \
    --depth 3 --games 64 --out models/anchor_r05_d3.json 2>/dev/null
  # epsilon ladder at depth 2: graded opponents between the d1/d2 cells,
  # old + new bundles on the SAME table
  for eps in 0.5 0.25; do
    python scripts/minimax_anchor.py \
      --models "$FLAG" models/pretrained/best_model \
      --depth 2 --epsilon "$eps" --games 64 \
      --out "models/anchor_r05_d2_eps${eps}.json" 2>/dev/null
  done
  ;;
ladder)
  # 5 rungs x 10 pairs: two tracked cross-round rungs (the round-4
  # ladder's Elo-362 and Elo-568 nets) + three flagship snapshots —
  # splices the round-5 curve onto the round-4 scale
  python -m xiangqi_alphazero_tpu.train.elo \
    --models models/continuity/iter80/best_model \
             models/pretrained/best_model \
             models/flagship/checkpoint_iter120 \
             models/flagship/checkpoint_iter200 \
             "$FLAG" \
    --games 64 --sims 40 --temperature 0.2 \
    2>/dev/null | tail -1 | tee models/elo_ladder_r05.json
  ;;
guards)
  python scripts/run_guards.py --out GUARDS_r05.json
  cat GUARDS_r05.json
  ;;
*)
  echo "usage: $0 {int8|h2h|anchor|ladder|guards}" >&2; exit 2;;
esac
