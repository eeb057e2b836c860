"""Corpus-profile tests (operators/profile.py): DuckDB oracle parity
on the real documents table, grouped variant, and the one-job plan
contract."""

from __future__ import annotations

import duckdb
import pytest

from topn_clashroyal_etl_sql_snapshot_spark.operators import profile
from topn_clashroyal_etl_sql_snapshot_spark.sources.readers import read_testdata

SF = "/root/testdata/sf0.001"

_TOKS_SQL = (
    "list_filter(string_split_regex(lower(regexp_replace(text, "
    "'[^a-zA-Z0-9 ]', ' ', 'g')), '\\s+'), x -> x <> '')"
)


def test_profile_matches_duckdb_oracle(spark):
    docs = read_testdata(spark, SF, "documents")
    row = profile.corpus_profile(docs).collect()[0]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    o = con.execute(f"""
        SELECT COUNT(*) AS docs,
               SUM(length(text)) AS total_chars,
               SUM(len({_TOKS_SQL})) AS total_tokens,
               quantile_cont(length(text), [0.1, 0.5, 0.9]) AS pct,
               COUNT(DISTINCT md5(lower(regexp_replace(text,
                   '[^a-zA-Z0-9 ]', ' ', 'g')))) AS unique_docs
        FROM documents
    """).fetchone()
    assert row["docs"] == o[0]
    assert row["total_chars"] == o[1]
    assert row["total_tokens"] == o[2]
    assert list(row["chars_p10_p50_p90"]) == pytest.approx(list(o[3]))
    assert row["unique_docs"] == o[4]
    assert row["dup_rate"] == pytest.approx((o[0] - o[4]) / o[0])
    assert row["avg_chars"] == pytest.approx(o[1] / o[0])
    assert 0.0 <= row["pct_und"] <= 1.0
    assert 0.0 <= row["quality_mean"] <= 1.0
    p10, p50, p90 = row["quality_p10_p50_p90"]
    assert p10 <= p50 <= p90
    assert row["replacement_char_rate"] == 0.0  # clean synthetic corpus


def test_profile_grouped(spark):
    docs = read_testdata(spark, SF, "documents")
    rows = profile.corpus_profile(docs, by="source").collect()
    assert sum(r["docs"] for r in rows) == docs.count()
    assert [r["source"] for r in rows] == sorted(r["source"] for r in rows)
    for r in rows:
        assert r["docs"] > 0 and r["total_chars"] > 0


def test_profile_is_one_aggregation(spark):
    """N statistics, one scan: exactly one pair of hash-aggregate
    phases around one exchange (plus the countDistinct Expand) — no
    per-metric re-scan, no Python."""
    docs = read_testdata(spark, SF, "documents")
    plan = (
        profile.corpus_profile(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # a single scan of the parquet source
    assert plan.count("Scan parquet") == 1
