from . import shards
from .snapshot import write_snapshot

__all__ = ["shards", "write_snapshot"]
