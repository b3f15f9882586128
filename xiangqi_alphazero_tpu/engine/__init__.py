from .oracle import (  # noqa: F401
    ACTION_SPACE,
    COLS,
    NSQ,
    ROWS,
    Position,
    decode_action,
    encode_action,
)
