from .incremental import (
    incremental_snapshot_query,
    stream_battles,
    windowed_match_counts,
)

__all__ = [
    "incremental_snapshot_query",
    "stream_battles",
    "windowed_match_counts",
]
