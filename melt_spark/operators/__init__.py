from .messages import message_df
from .latest_state import latest_state
from .diff import diff, deleted_keys
from .sync import sync_plan
from .cdc import replay_changes, change_stats

__all__ = [
    "message_df",
    "latest_state",
    "diff",
    "deleted_keys",
    "sync_plan",
    "replay_changes",
    "change_stats",
]
