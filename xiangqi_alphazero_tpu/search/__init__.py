from .mcts import (  # noqa: F401
    MCTSConfig,
    SearchResult,
    action_probs_dense,
    run_mcts,
    sample_actions,
)
