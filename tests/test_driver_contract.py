"""Driver-mimic test: run every queries() entry at sf0.01 with Spark AND
its oracle_sql with DuckDB, compare row count, column names, and
order-insensitive values — the same bar CORRECTNESS_r{N}.json applies."""

from __future__ import annotations

import math

import duckdb
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
    # exact compare, including float bit-equality (NaN normalized) — the
    # driver's value hash is assumed exact, so ours must be too
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _rows(rows):
    # null-safe sort key (CUBE emits None group keys)
    return sorted(
        (tuple(_norm(v) for v in r) for r in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


ALL = sorted(spark_entry.queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    oracle = spark_entry.oracle_sql().get(name)
    fn = spark_entry.queries()[name]
    sdf = fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if oracle is None:
        assert len(srows) >= 0  # rows-only check
        return
    drel = duck.execute(oracle)
    dcols = [d[0] for d in drel.description]
    drows = drel.fetchall()
    assert sdf.columns == dcols, f"{name}: column mismatch {sdf.columns} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    assert _rows(srows) == _rows(drows), f"{name}: value mismatch"


def test_entry_smoke(spark):
    df = spark_entry.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns
