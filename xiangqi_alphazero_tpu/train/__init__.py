"""Training orchestration package.

Heavy submodules are exported lazily (PEP 562): the train CLI must be able
to run ``jax.distributed.initialize`` BEFORE anything touches the backend,
and importing the trainer/self-play modules materializes device constants
(engine.env table setup). ``config`` stays eager — it is pure stdlib.
"""

from .config import PRESETS, TrainingConfig  # noqa: F401

_LAZY = {
    "ReplayBuffer": ("replay", "ReplayBuffer"),
    "SelfPlaySettings": ("selfplay", "SelfPlaySettings"),
    "selfplay_games": ("selfplay", "selfplay_games"),
    "AlphaZeroTrainer": ("trainer", "AlphaZeroTrainer"),
    "full_config": ("config", "full_config"),
    "quick_config": ("config", "quick_config"),
    "standard_config": ("config", "standard_config"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["PRESETS", "TrainingConfig", *_LAZY]
