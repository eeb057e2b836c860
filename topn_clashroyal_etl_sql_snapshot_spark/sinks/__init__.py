from . import shards
from .snapshot import (
    publish_snapshot_jdbc,
    publish_snapshot_jdbc_atomic,
    publish_warehouse_jdbc,
    publish_warehouse_jdbc_atomic,
    write_snapshot,
    write_snapshot_atomic,
    write_snapshot_jdbc,
)

__all__ = [
    "shards",
    "publish_snapshot_jdbc",
    "publish_snapshot_jdbc_atomic",
    "publish_warehouse_jdbc",
    "publish_warehouse_jdbc_atomic",
    "write_snapshot",
    "write_snapshot_atomic",
    "write_snapshot_jdbc",
]
