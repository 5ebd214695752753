from .continuous import (stream_from_parquet, stream_latest_state_query,
                         windowed_event_counts)
from .dedup_state import streaming_first_seen
from .cdc_tail import CdcTail
from .foreach_merge import KeyedStateSink

__all__ = [
    "stream_from_parquet",
    "stream_latest_state_query",
    "windowed_event_counts",
    "streaming_first_seen",
    "CdcTail",
    "KeyedStateSink",
]
