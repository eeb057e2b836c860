"""Driver-mimic test: run every queries() entry at sf0.01 with Spark AND
its oracle_sql with DuckDB, compare row count, column names, and
order-insensitive values — the same bar CORRECTNESS_r{N}.json applies.

The comparison goes THROUGH PANDAS on both sides (``toPandas()`` /
``duckdb .df()``) with type-strict value normalization, because that is
where the driver's hash diverges: DuckDB returns ``SUM(int)`` as HUGEINT,
which pandas renders as float64 (``1008.0``), while Spark returns BIGINT
(``1008``).  Python's ``==`` coerces those equal; the driver's value hash
does not.  ``_norm`` therefore tags every value with its numeric kind so
an int/float divergence fails here before it fails in the driver.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd
import pytest

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
spec = importlib.util.spec_from_file_location("spark_entry", REPO / "__spark_entry__.py")
spark_entry = importlib.util.module_from_spec(spec)
sys.modules["spark_entry"] = spark_entry
spec.loader.exec_module(spark_entry)

SF_DIR = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    """Type-strict normalization: ints and floats never compare equal,
    NaN is stable, containers normalize recursively."""
    if v is None or v is pd.NaT:
        return ("null",)
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return ("f", "NaN" if math.isnan(f) else f)
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, Decimal):
        # a Decimal on either side is a dtype the driver would render
        # differently from DOUBLE — keep it distinct from float
        return ("dec", str(v))
    if isinstance(v, np.ndarray):
        return ("a", tuple(_norm(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_norm(x) for x in v))
    if isinstance(v, pd.Timestamp):
        return ("t", v.isoformat())
    if isinstance(v, str):
        return ("s", v)
    return (type(v).__name__, str(v))


def _rows(pdf: pd.DataFrame):
    rows = [
        tuple(_norm(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


ALL = sorted(spark_entry.queries().keys())


def test_registry_fits_driver_cap():
    """The driver records correctness rows for at most 50 registered
    queries; anything beyond the cap silently never earns a row. Keep
    the registry at or under the cap, and keep every entry oracled."""
    qs = spark_entry.queries()
    oracles = spark_entry.oracle_sql()
    assert len(qs) <= 50, f"{len(qs)} registered queries exceed the 50-row cap"
    assert set(oracles) <= set(qs)
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"queries without oracles: {missing}"


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    oracle = spark_entry.oracle_sql().get(name)
    fn = spark_entry.queries()[name]
    sdf = fn(spark, SF_DIR)
    spdf = sdf.toPandas()
    if oracle is None:
        assert len(spdf) >= 0  # rows-only check
        return
    dpdf = duck.execute(oracle).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{name}: column mismatch {sorted(spdf.columns)} vs {sorted(dpdf.columns)}"
    )
    cols = sorted(spdf.columns)  # driver sorts columns by name before hashing
    spdf, dpdf = spdf[cols], dpdf[cols]
    assert len(spdf) == len(dpdf), f"{name}: row count {len(spdf)} vs {len(dpdf)}"
    srows, drows = _rows(spdf), _rows(dpdf)
    mism = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b][:3]
    assert srows == drows, (
        f"{name}: value mismatch at sorted rows {mism}; "
        f"spark={[srows[i] for i in mism]} oracle={[drows[i] for i in mism]}"
    )


def test_entry_smoke(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
