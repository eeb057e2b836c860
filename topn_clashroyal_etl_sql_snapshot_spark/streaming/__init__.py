from . import corpus, stateful
from .incremental import (
    incremental_snapshot_query,
    stream_battles,
    streaming_dedup_matches,
    streaming_session_stats,
    windowed_match_counts,
)

__all__ = [
    "corpus",
    "stateful",
    "incremental_snapshot_query",
    "streaming_session_stats",
    "stream_battles",
    "streaming_dedup_matches",
    "windowed_match_counts",
]
