"""xiangqi_alphazero_tpu — a TPU-native (JAX/XLA/pjit/Pallas) Xiangqi AlphaZero framework.

Re-designed from scratch for TPU hardware with the capabilities of the reference
CPU/GPU PyTorch project (wenjunyang/xiangqi-alphazero):

- ``engine``  — rules: a pure-Python oracle (parity fixture / host play) and a
  vectorized pure-JAX environment computing full 8100-action legal masks for
  thousands of boards in lockstep (replaces the reference's Cython hot path,
  reference: training/cython_engine/game_core.pyx).
- ``models``  — flax policy-value ResNet (reference: training/model.py).
- ``search``  — batched array-based MCTS, NN evals fused across the whole game
  batch on-device (replaces the per-game Python tree + socket inference server,
  reference: training/mcts.py, training/inference_server.py).
- ``train``   — self-play -> train -> gated-eval orchestration, replay buffer,
  Orbax checkpoints (reference: training/train.py).
- ``parallel``— jax.sharding mesh / pjit utilities: data-parallel learner and
  sharded env fleets over ICI/DCN (replaces process pools + Unix-socket IPC,
  reference: training/parallel_selfplay.py).
- ``serve``   — model export and a play/analysis API (reference:
  training/export_model.py, demo/app.py).
"""

__version__ = "0.1.0"

ROWS = 10
COLS = 9
NUM_SQUARES = ROWS * COLS
ACTION_SPACE = NUM_SQUARES * NUM_SQUARES  # 8100
