"""Oracle parity for queries ROTATED OUT of the driver registry at the
50-row cap (r8: dedup_trigram_jaccard, events_hourly_rollup,
percentile_order_prices made room for the r7-crop rows). Rotation must
not weaken verification: each rotated query keeps running here against
the IDENTICAL DuckDB SQL it used to register with, at the same sf0.01
the driver uses."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from topn_clashroyal_etl_sql_snapshot_spark.plans import (
    llm_queries,
    testdata_queries,
)

SF_DIR = "/root/testdata/sf0.01"

_TRIGRAM_SQL = llm_queries._JACCARD_PAIRS_SQL

_HOURLY_SQL = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """

_PCTL_SQL = """
    SELECT o_orderpriority,
           CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(o_totalprice, 0.9) AS DOUBLE) AS p90
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """

_WINDOW_SQL = """
    SELECT o_custkey, o_orderkey, rn FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    ) t
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """

CASES = {
    "window_top_orders_per_customer": (
        testdata_queries.window_top_orders_per_customer,
        _WINDOW_SQL,
    ),
    "dedup_trigram_jaccard": (llm_queries.dedup_trigram_jaccard, _TRIGRAM_SQL),
    "events_hourly_rollup": (
        testdata_queries.events_hourly_rollup,
        _HOURLY_SQL,
    ),
    "percentile_order_prices": (
        testdata_queries.percentile_order_prices,
        _PCTL_SQL,
    ),
    # rotated out for docs_dsir_weights: the get_json_object surface
    # keeps the driver's oracle bar here
    "events_props_json": (
        testdata_queries.events_props_json,
        testdata_queries.EVENTS_PROPS_JSON_SQL,
    ),
    # rotated out for docs_gopher_gates: TPC-H joins stay represented
    # by q1 + q5 in the registry, Q3 keeps its oracle bar here
    "q3_shipping_priority": (
        testdata_queries.q3_shipping_priority,
        testdata_queries.Q3_SHIPPING_PRIORITY_SQL,
    ),
    # rotated out r9 for docs_exact_substring (1-row aggregate check;
    # float-mean columns stay tolerance-checked in tests/test_profile.py)
    "docs_corpus_profile": (
        llm_queries.docs_corpus_profile,
        llm_queries.DOCS_CORPUS_PROFILE_SQL,
    ),
    # rotated out r9 for embedding_pq_adc (two-boolean contract row;
    # the tighter empirical bound lives in tests/test_sketches.py)
    "approx_distinct_sketch": (
        testdata_queries.approx_distinct_sketch,
        testdata_queries.APPROX_DISTINCT_SKETCH_SQL,
    ),
    # rotated out r9 for docs_classifier_margin (its tokenize twin is
    # load-bearing in a dozen other registered oracles)
    "text_token_stats": (
        llm_queries.text_token_stats,
        llm_queries.TEXT_TOKEN_STATS_SQL,
    ),
    # rotated out r9 for text_ngram_repetition (1-row accounting check;
    # fingerprint ≡ md5 parity also rides curation_funnel's dedup stage)
    "dedup_exact_summary": (
        llm_queries.dedup_exact_summary,
        llm_queries.DEDUP_EXACT_SUMMARY_SQL,
    ),
    # rotated out r9 for docs_winnow_overlap (projection-level wordlist
    # check; its tokenize+broadcast-join semantics also ride the
    # registered docs_classifier_margin row)
    "docs_term_quality": (
        llm_queries.docs_term_quality,
        llm_queries.DOCS_TERM_QUALITY_SQL,
    ),
    # rotated out r10 for dedup_minhash_incremental (the winnowing
    # selection rule is restated verbatim inside the registered
    # docs_winnow_overlap oracle)
    "text_winnow_fingerprints": (
        llm_queries.text_winnow_fingerprints,
        llm_queries.TEXT_WINNOW_FINGERPRINTS_SQL,
    ),
    # rotated out r10 for dedup_component_keepers (windowed-aggregate
    # shape stays driver-covered by events_sessionize)
    "events_rolling_sum": (
        testdata_queries.events_rolling_sum,
        testdata_queries.EVENTS_ROLLING_SUM_SQL,
    ),
    # rotated out r10 for docs_split_by_component, which strictly
    # subsumes the bucket-math check on the component-coalesced key
    "docs_with_split": (
        llm_queries.docs_with_split,
        llm_queries.DOCS_WITH_SPLIT_SQL,
    ),
    # rotated out r10 for docs_semantic_decontam: the four set-op
    # shapes stay driver-covered (cr_player_decks' broadcast left_semi,
    # decontaminate_overlap's anti leg, per-leg plan pins in
    # tests/test_plans.py)
    "setops_suite": (
        testdata_queries.setops_suite,
        testdata_queries.SETOPS_SUITE_SQL,
    ),
    # rotated out r11 for embedding_centroid_gate (thinnest row at the
    # cap; every chunk's md5-checked content bar keeps running here,
    # and the same windowing oracle is pinned in tests/test_chunking.py)
    "chunk_by_chars": (
        llm_queries.chunk_by_chars,
        llm_queries.CHUNK_BY_CHARS_SQL,
    ),
    # rotated out r11 for dedup_components_incremental, which registers
    # the IDENTICAL recursive-CTE oracle (incremental ≡ full run is the
    # operator's defining invariant) over strictly more machinery
    "dedup_components": (
        llm_queries.dedup_components,
        llm_queries.DEDUP_COMPONENTS_SQL,
    ),
    # rotated out r11 for dedup_exact_incremental_gate (the exact
    # family's incremental gate joins the registered incrementals);
    # the bit-for-bit window bar keeps running here
    "docs_pack_greedy": (
        llm_queries.docs_pack_greedy,
        llm_queries.DOCS_PACK_GREEDY_SQL,
    ),
    # rotated out r14 for embedding_neardup_incremental (the last
    # dedup family member without a driver row); the lineitem scan-agg
    # shape stays driver-covered by cube_returnflag_status's strictly
    # larger grouping-sets aggregate
    "q1_pricing_summary": (
        testdata_queries.q1_pricing_summary,
        testdata_queries.Q1_PRICING_SUMMARY_SQL,
    ),
    # rotated out r12 for mixture_gate (the incremental mixer was the
    # only substantial r11 capability outside the driver's oracle);
    # the confusion-matrix bar keeps running here, and the lang-ID
    # expression stays driver-covered as curation_funnel's first gate
    "text_language_id": (
        llm_queries.text_language_id,
        llm_queries.TEXT_LANGUAGE_ID_SQL,
    ),
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("events", "orders", "documents", "customer", "lineitem", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(CASES))
def test_rotated_row_matches_oracle(spark, duck, name):
    fn, sql = CASES[name]
    spdf = fn(spark, SF_DIR).toPandas()
    dpdf = duck.execute(sql).df()
    assert sorted(spdf.columns) == sorted(dpdf.columns)
    cols = sorted(spdf.columns)
    s = spdf[cols].sort_values(cols).reset_index(drop=True)
    d = dpdf[cols].sort_values(cols).reset_index(drop=True)
    assert len(s) == len(d), f"{name}: {len(s)} vs {len(d)} rows"
    pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
