from .replay import (  # noqa: F401
    stream_replay_available_now,
    stream_windowed_op_counts,
    event_log_stream,
)
from .source import register_changelog_source  # noqa: F401
from .stateful import stateful_current_state_changelog  # noqa: F401
