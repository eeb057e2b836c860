"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` delegate to the engine's registered query
surface (``topn_clashroyal_etl_sql_snapshot_spark/plans/testdata_queries.py``
and the extension operators); ``entry()`` runs the flagship multi-join
top-K on sf0.001.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from topn_clashroyal_etl_sql_snapshot_spark.plans import (  # noqa: E402
    domain_queries,  # noqa: F401 — registers the cr_* pipeline-parity queries
    llm_queries,  # noqa: F401 — registers the LLM-pipeline queries
    testdata_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return testdata_queries.q5_region_order_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return testdata_queries.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column aliases)."""
    return testdata_queries.oracle_sql()
