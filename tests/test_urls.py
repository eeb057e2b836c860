"""URL hygiene tests (functions/urls.py): host extraction vs a
urllib-based twin, tracking-param stripping, normalization, suffix
chains, and the label-boundary blocklist join (broadcast plan pin,
subdomain match, no substring false-positives)."""

from __future__ import annotations

from urllib.parse import urlsplit

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.functions import urls

URLS = [
    "https://www.example.com/path?a=1",
    "http://Sub.Domain.ORG:8080/x/y#frag",
    "ftp://user:pw@files.example.net/dir",
    "example.com/bare",
    "https://host.co.uk.",
    "https://a.b.c.d.e.f.g.h/deep",
]


def _df(spark, values, name="url"):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], f"doc_id long, {name} string"
    )


def test_url_host_matches_urllib(spark):
    df = _df(spark, URLS)
    got = {
        r["doc_id"]: r["h"]
        for r in df.select("doc_id", urls.url_host(F.col("url")).alias("h")).collect()
    }
    for i, u in enumerate(URLS):
        parse_u = u if "://" in u else "http://" + u
        expect = urlsplit(parse_u).hostname.rstrip(".")
        assert got[i] == expect, (u, got[i], expect)


def test_url_host_null_and_garbage(spark):
    df = _df(spark, [None, "", "   ", "/relative/path"])
    got = [
        r["h"]
        for r in df.select(urls.url_host(F.col("url")).alias("h")).collect()
    ]
    assert got[0] is None and got[1] is None and got[2] is None
    # a relative path has no host-like prefix before '/'
    assert got[3] is None


def test_registered_domain_heuristic(spark):
    df = _df(spark, ["https://ads.tracker.co.uk/x", "http://example.com"])
    got = [
        (r["d2"], r["d3"])
        for r in df.select(
            urls.registered_domain(F.col("url")).alias("d2"),
            urls.registered_domain(F.col("url"), 3).alias("d3"),
        ).collect()
    ]
    assert got[0] == ("co.uk", "tracker.co.uk")
    assert got[1] == ("example.com", "example.com")  # shorter than n_labels
    with pytest.raises(ValueError):
        urls.registered_domain(F.col("url"), 0)


def test_strip_tracking_params(spark):
    cases = {
        "https://e.com/p?utm_source=x&q=1": "https://e.com/p?q=1",
        "https://e.com/p?q=1&utm_medium=y": "https://e.com/p?q=1",
        "https://e.com/p?utm_a=1&utm_b=2": "https://e.com/p",
        "https://e.com/p?fbclid=abc#frag": "https://e.com/p#frag",
        "https://e.com/p?gclid=1&q=2&msclkid=3": "https://e.com/p?q=2",
        "https://e.com/p?keep=utm_source": "https://e.com/p?keep=utm_source",
    }
    df = _df(spark, list(cases))
    got = [
        r["s"]
        for r in df.orderBy("doc_id")
        .select(urls.strip_tracking_params(F.col("url")).alias("s"))
        .collect()
    ]
    assert got == list(cases.values())


def test_url_normalize(spark):
    cases = {
        "HTTPS://Example.COM:443/Path?q=CaseKept": "https://example.com/Path?q=CaseKept",
        "http://e.com:80/a": "http://e.com/a",
        "http://e.com:8080/a": "http://e.com:8080/a",  # non-default port kept
        "https://e.com/p?utm_source=x#sec": "https://e.com/p",
        "https://e.com/": "https://e.com",
        "https://e.com/a/": "https://e.com/a/",  # only the bare-host slash drops
        # scheme-less / protocol-relative hosts lowercase like url_host
        # does (r7 ADVICE: schemed and bare spellings must share a key)
        "Example.COM/Path?q=Kept": "example.com/Path?q=Kept",
        "//Example.COM/X": "//example.com/X",
        "Example.COM/": "example.com",
        # no scheme → no default-port fact; port survives
        "Example.COM:80/a": "example.com:80/a",
    }
    df = _df(spark, list(cases))
    got = [
        r["s"]
        for r in df.orderBy("doc_id")
        .select(urls.url_normalize(F.col("url")).alias("s"))
        .collect()
    ]
    assert got == list(cases.values())


def test_host_suffixes_chain_and_cap(spark):
    df = _df(spark, ["https://a.b.co/x", "https://a.b.c.d.e.f.g.h/x"])
    got = [
        list(r["s"])
        for r in df.orderBy("doc_id")
        .select(urls.host_suffixes(F.col("url")).alias("s"))
        .collect()
    ]
    assert got[0] == ["a.b.co", "b.co", "co"]
    assert len(got[1]) == 6  # max_labels cap
    assert got[1][0] == "c.d.e.f.g.h" and got[1][-1] == "h"


def test_blocklist_label_boundary(spark):
    rows = [
        (1, "https://ads.tracker.com/banner"),  # subdomain of listed
        (2, "https://tracker.com/x"),  # exact listed
        (3, "https://nottracker.com/x"),  # substring — must SURVIVE
        (4, "https://example.org/ok"),
        (5, None),  # unparseable — passes a blocklist
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = {
        r["doc_id"]
        for r in urls.filter_by_domain_blocklist(df, ["tracker.com"]).collect()
    }
    assert kept == {3, 4, 5}
    only = {
        r["doc_id"]
        for r in urls.filter_by_domain_blocklist(
            df, ["tracker.com"], keep_matches=True
        ).collect()
    }
    assert only == {1, 2}
    # empty list: drop-mode keeps everything, keep-mode keeps nothing
    assert urls.filter_by_domain_blocklist(df, []).count() == 5
    assert urls.filter_by_domain_blocklist(df, [], keep_matches=True).count() == 0


def test_blocklist_plan_broadcast_no_python(spark):
    df = _df(spark, URLS)
    plan = (
        urls.filter_by_domain_blocklist(df, ["example.com", "domain.org"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_tracking_strip_never_corrupts_suffix_named_params(spark):
    """Review regression: a param whose NAME merely ends with a
    tracking name must survive byte-for-byte."""
    cases = {
        "https://e.com/p?notutm_source=a&x=1": "https://e.com/p?notutm_source=a&x=1",
        "https://e.com/p?myfbclid=2": "https://e.com/p?myfbclid=2",
        "https://e.com/p?href_src=x&utm_source=y": "https://e.com/p?href_src=x",
    }
    df = _df(spark, list(cases))
    got = [
        r["s"]
        for r in df.orderBy("doc_id")
        .select(urls.strip_tracking_params(F.col("url")).alias("s"))
        .collect()
    ]
    assert got == list(cases.values())


def test_normalize_keeps_cross_scheme_nondefault_ports(spark):
    """Review regression: :443 is NOT default for http (nor :80 for
    https) — normalization must keep them distinct origins."""
    cases = {
        "http://e.com:443/x": "http://e.com:443/x",
        "https://e.com:80/x": "https://e.com:80/x",
    }
    df = _df(spark, list(cases))
    got = [
        r["s"]
        for r in df.orderBy("doc_id")
        .select(urls.url_normalize(F.col("url")).alias("s"))
        .collect()
    ]
    assert got == list(cases.values())
