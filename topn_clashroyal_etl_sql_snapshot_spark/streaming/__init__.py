from .incremental import (
    incremental_snapshot_query,
    stream_battles,
    streaming_dedup_matches,
    windowed_match_counts,
)

__all__ = [
    "incremental_snapshot_query",
    "stream_battles",
    "streaming_dedup_matches",
    "windowed_match_counts",
]
