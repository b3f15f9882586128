from .config import (  # noqa: F401
    PRESETS,
    TrainingConfig,
    full_config,
    quick_config,
    standard_config,
)
from .replay import ReplayBuffer  # noqa: F401
from .selfplay import SelfPlaySettings, selfplay_games  # noqa: F401
from .trainer import AlphaZeroTrainer  # noqa: F401
