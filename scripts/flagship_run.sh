#!/usr/bin/env bash
# Round-5 flagship run: the reference's full-preset-class network
# (256ch/10res — reference: training/train.py:692-704) trained with the
# measured production recipe (gumbel-32 self-play, 256 games/iteration —
# models/README.md h2h section) under the auto-restart supervisor.
#
# Differences from the reference full preset, each deliberate & measured:
#   - gumbel-32 self-play instead of PUCT-400 (0.664 at matched wall,
#     models/h2h/result.json)
#   - 256 games/iteration instead of 50 (the chip's fleet size; same lever
#     as the round-3/4 strength runs)
#   - replay ring 150k samples (≈ the reference's own reuse ratio: its 50k
#     buffer at 16k samples/iter ≈ 3 iterations of history; ours holds
#     ≈2.7 iterations at ≈56k samples/iter) instead of the r04 run's 500k,
#     which at 256ch would cost ~230 s/iteration of training alone
#   - --train-segment 384: watchdog-bounded training programs (bit-exact
#     vs the fused scan, tests/test_train.py::test_train_segmentation_*)
#
# Usage: bash scripts/flagship_run.sh [iterations]
set -e
cd "$(dirname "$0")/.."
ITERS="${1:-200}"
export XQAZ_STALL_TIMEOUT_S=2700
exec python -m xiangqi_alphazero_tpu.train \
  --mode tpu \
  --channels 256 --res-blocks 10 \
  --search-algo gumbel --simulations 32 --max-considered 16 \
  --games-per-iter 256 --iterations "$ITERS" \
  --max-buffer 150000 --batch-size 1024 --train-segment 384 \
  --eval-interval 5 --save-interval 5 \
  --seed 7 --auto-restart 60 \
  --checkpoint-dir models/flagship
