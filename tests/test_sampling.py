"""Deterministic sampling/splitting (operators/sampling.py) and the
pure-Python xxHash64 twin (testing/xxh64.py).

The twin is the independent oracle here: Spark's xxhash64 cannot be
re-computed by DuckDB, so every hash-derived assignment (bucket, split
label, sample membership) is re-derived row-for-row in pure Python.
``per_group_cap`` has no hash dependence, so it gets a DuckDB
row_number() oracle instead.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
    DEFAULT_BUCKETS,
    bucket_expr,
    hash_sample,
    per_group_cap,
    stratified_hash_sample,
    with_split,
)
from topn_clashroyal_etl_sql_snapshot_spark.testing.xxh64 import (
    SPARK_DEFAULT_SEED,
    spark_xxhash64,
    xxh64_bytes,
)

# ---------------------------------------------------------------- twin


def test_xxh64_twin_matches_spark_strings(spark):
    # lengths 0..40 cross every branch of the algorithm: the <32 short
    # path, the >=32 stripe loop, and 8/4/1-byte tail combinations.
    values = ["x" * n for n in range(41)] + ["héllo wörld", "é世界"]
    df = spark.createDataFrame([(v,) for v in values], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.withColumn("h", F.xxhash64("s")).collect()
    }
    for v in values:
        assert got[v] == spark_xxhash64([("string", v)]), repr(v)


def test_xxh64_twin_matches_spark_numeric_and_chained(spark):
    rows = [(1, 10), (-1, -10), (2**31 - 1, 2**63 - 1), (0, 0), (None, 5)]
    df = spark.createDataFrame(rows, "i int, l long")
    got = df.select(
        F.xxhash64("i").alias("hi"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("i", "l").alias("hc"),
    ).collect()
    for (i, l), r in zip(rows, got):
        assert r["hi"] == spark_xxhash64([("int", i)])
        assert r["hl"] == spark_xxhash64([("long", l)])
        # multi-arg chains left to right; None contributes nothing
        assert r["hc"] == spark_xxhash64([("int", i), ("long", l)])


def test_xxh64_twin_custom_seed_and_binary(spark):
    df = spark.createDataFrame([(b"\x00\x01\xff",)], "b binary")
    assert df.select(F.xxhash64("b").alias("h")).first()["h"] == spark_xxhash64(
        [("binary", b"\x00\x01\xff")]
    )
    # public-spec sanity: seed folds in, empty input is well-defined
    assert xxh64_bytes(b"", 0) == 0xEF46DB3751D8E999


def _twin_bucket(key: str | None, seed: int = 42, buckets: int = DEFAULT_BUCKETS) -> int:
    h = spark_xxhash64([("long", seed), ("string", key)])
    return h % buckets  # Python % == Spark pmod for positive modulus


# ------------------------------------------------------------- bucket/split


def _keys(n: int) -> list[str]:
    return [f"doc-{i:05d}" for i in range(n)]


def test_bucket_expr_matches_twin(spark):
    keys = _keys(500)
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = df.select("k", bucket_expr("k").alias("b")).collect()
    for r in got:
        assert r["b"] == _twin_bucket(r["k"])


def test_xxh64_bucket_sql_matches_spark_and_twin(spark):
    """The generated DuckDB CTE chain (plans/xxh64_sql.py) must equal
    Spark's pmod(xxhash64(42L, key), 10000) lane-for-lane — it is the
    oracle-side sampling for driver rows (embedding_neardup_pairs), so
    a single mismatched bucket silently changes a driver sample."""
    from topn_clashroyal_etl_sql_snapshot_spark.plans.xxh64_sql import (
        hash_long,
        xxh64_bucket_ctes,
    )

    # adversarial keys: sign boundary, 32-bit boundary, extremes
    keys = (
        list(range(200))
        + [2**31 - 1, 2**31, 2**32 - 1, 2**32, 2**63 - 1, -1, -2**63]
        + [i * 961748927 for i in range(200)]
    )
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    want = {r["k"]: r["b"] for r in df.select("k", bucket_expr("k").alias("b")).collect()}

    sql = (
        "WITH src AS (SELECT UNNEST(?) AS k),\n"
        + xxh64_bucket_ctes("src", "k")
        + "\nSELECT k, _bucket FROM _xxbkt"
    )
    got = dict(duckdb.connect().execute(sql, [keys]).fetchall())
    assert got == want

    # and the baked seed-chain math agrees with the independent twin:
    # xxhash64(42L, key) == hashLong(key, hashLong(42, 42))
    from topn_clashroyal_etl_sql_snapshot_spark.testing.xxh64 import (
        spark_xxhash64,
    )

    for k in (0, 1, -1, 2**31, 2**63 - 1):
        assert hash_long(k % (1 << 64), hash_long(42, 42)) == spark_xxhash64(
            [("long", 42), ("long", k)]
        ) % (1 << 64)


def test_xxh64_int_chain_matches_spark(spark):
    """hash_int (r14): the 4-byte-lane twin behind the
    embedding_neardup_incremental oracle's literal coefficient table —
    spark_xxhash64_int2(q, d) must equal F.xxhash64(q, d) over INT
    columns exactly, including negative ints (zero-extension, not
    sign-extension) and 31-bit boundaries."""
    from pyspark.sql import functions as F

    from topn_clashroyal_etl_sql_snapshot_spark.plans.xxh64_sql import (
        spark_xxhash64_int2,
    )

    vals = [0, 1, 63, 64, 127, 2**16, 2**31 - 1, -1, -2**31]
    rows = [(a, b) for a in vals for b in vals]
    df = spark.createDataFrame(rows, "a int, b int").withColumn(
        "h", F.xxhash64(F.col("a"), F.col("b"))
    )
    for r in df.collect():
        assert spark_xxhash64_int2(r["a"], r["b"]) == r["h"], (r["a"], r["b"])


def test_xxh64_ascii_sql_matches_spark_strings(spark):
    """The byte-level string-hash CTE chain
    (plans/xxh64_sql.py::xxh64_ascii_ctes) must equal Spark's
    single-argument xxhash64(varchar) byte-for-byte — it is what makes
    hashed-feature operators driver-oracle-able
    (docs_classifier_margin). Cases cover every code path: empty
    string, each tail-byte count, the 4-byte chunk, 1-3 trailing
    words, the 32-byte stripe boundary (31/32/33), multi-stripe
    inputs, and 400 random ASCII strings of length 0-80."""
    import random
    import string as pystr

    from pyspark.sql import functions as F

    from topn_clashroyal_etl_sql_snapshot_spark.plans.xxh64_sql import (
        xxh64_ascii_ctes,
    )

    rng = random.Random(1234)
    cases = (
        ["", "a", "ab", "abc", "abcd", "abcde", "abcdefg", "hello wo",
         "123456789", "0123456789abc", "0123456789abcdef",
         "0123456789abcdef01234567",
         "0123456789abcdef0123456789abcde",
         "0123456789abcdef0123456789abcdef",
         "0123456789abcdef0123456789abcdef0",
         "x" * 40, "y" * 63, "z" * 64, "q" * 65, "w" * 100]
        + [
            "".join(
                rng.choice(pystr.ascii_lowercase + pystr.digits + " ")
                for _ in range(rng.randint(0, 80))
            )
            for _ in range(400)
        ]
    )
    cases = sorted(set(cases))
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    want = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    sql = (
        "WITH src AS (SELECT UNNEST(?) AS s),\n"
        + xxh64_ascii_ctes("src", "s")
        + "\nSELECT s, _hash FROM _xxstr"
    )
    got = dict(duckdb.connect().execute(sql, [cases]).fetchall())
    assert got == want
    # and against the independent pure-Python twin
    for c in cases[:50]:
        assert got[c] == spark_xxhash64([("string", c)])


def test_with_split_labels_match_twin_and_are_exhaustive(spark):
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    keys = _keys(2000)
    df = with_split(
        spark.createDataFrame([(k,) for k in keys], "k string"), "k", weights
    )
    thresholds = [("train", 8000), ("val", 9000), ("test", DEFAULT_BUCKETS)]
    rows = df.collect()
    assert len(rows) == len(keys)
    for r in rows:
        b = _twin_bucket(r["k"])
        expected = next(name for name, t in thresholds if b < t)
        assert r["split"] == expected
    # proportions land near the weights (hash uniformity at n=2000)
    counts = {r["split"]: 0 for r in rows}
    for r in rows:
        counts[r["split"]] += 1
    assert 0.75 <= counts["train"] / len(keys) <= 0.85
    assert counts["train"] + counts["val"] + counts["test"] == len(keys)


def test_with_split_append_stable(spark):
    # growing the corpus must not move previously assigned keys
    small = _keys(300)
    big = _keys(900)
    a = with_split(spark.createDataFrame([(k,) for k in small], "k string"), "k")
    b = with_split(spark.createDataFrame([(k,) for k in big], "k string"), "k")
    assign_a = {r["k"]: r["split"] for r in a.collect()}
    assign_b = {r["k"]: r["split"] for r in b.collect()}
    for k in small:
        assert assign_a[k] == assign_b[k]


def test_with_split_null_key_lands_in_one_bucket(spark):
    df = with_split(
        spark.createDataFrame([(None,), (None,), ("k",)], "k string"), "k"
    )
    labels = {r["split"] for r in df.filter(F.col("k").isNull()).collect()}
    assert len(labels) == 1  # deterministic, not dropped
    null_bucket = spark_xxhash64([("long", 42), ("string", None)]) % DEFAULT_BUCKETS
    expected = "train" if null_bucket < 9800 else ("val" if null_bucket < 9900 else "test")
    assert labels == {expected}


def test_split_weight_validation():
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        _cumulative_thresholds,
    )

    with pytest.raises(ValueError, match="positive"):
        _cumulative_thresholds({"a": 0.0}, 100)
    with pytest.raises(ValueError, match="negative"):
        _cumulative_thresholds({"a": 1.0, "b": -0.1}, 100)
    # rounding never orphans the top bucket
    assert _cumulative_thresholds({"a": 1, "b": 1, "c": 1}, 10000)[-1][1] == 10000


# ------------------------------------------------------------------ sample


def test_hash_sample_matches_twin_and_nests(spark):
    keys = _keys(1000)
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    kept_half = {r["k"] for r in hash_sample(df, "k", 0.5).collect()}
    kept_quarter = {r["k"] for r in hash_sample(df, "k", 0.25).collect()}
    for k in keys:
        assert (k in kept_half) == (_twin_bucket(k) < 5000)
    # thresholds nest: a smaller fraction is a subset of a larger one
    assert kept_quarter <= kept_half
    assert hash_sample(df, "k", 0.0).count() == 0
    assert hash_sample(df, "k", 1.0).count() == len(keys)
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(df, "k", 1.5)


def test_stratified_hash_sample(spark):
    rows = [(f"d{i}", "en" if i % 3 else "de") for i in range(600)]
    df = spark.createDataFrame(rows, "k string, lang string")
    out = stratified_hash_sample(df, "lang", {"en": 0.5}, key="k").collect()
    # absent strata are dropped, matching DataFrame.sampleBy semantics
    assert all(r["lang"] == "en" for r in out)
    kept = {r["k"] for r in out}
    for k, lang in rows:
        expected = lang == "en" and _twin_bucket(k) < 5000
        assert (k in kept) == expected
    with pytest.raises(ValueError, match="stratum"):
        stratified_hash_sample(df, "lang", {"en": 2.0}, key="k")


# ------------------------------------------------------------ per_group_cap


def test_per_group_cap_duckdb_oracle(spark):
    rows = [
        (f"g{i % 5}", f"r{i:03d}", (i * 37) % 100) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "grp string, id string, score int")
    got = per_group_cap(df, ["grp"], [F.col("score").desc(), F.col("id")], k=3)
    got_rows = sorted((r["grp"], r["id"]) for r in got.collect())

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (grp VARCHAR, id VARCHAR, score INT)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        (g, i)
        for g, i in con.execute(
            """
            SELECT grp, id FROM (
              SELECT grp, id,
                     row_number() OVER (PARTITION BY grp
                                        ORDER BY score DESC, id) AS rn
              FROM t
            ) WHERE rn <= 3
            """
        ).fetchall()
    )
    assert got_rows == want
    # schema passes through unchanged (helper column dropped)
    assert got.columns == ["grp", "id", "score"]
    with pytest.raises(ValueError, match="k must be"):
        per_group_cap(df, ["grp"], ["id"], k=0)


# ---------------------------------------------------------------- plan shape


def _plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _exchanges(plan: str) -> int:
    # formatted explain lists each node once in the tree and once in the
    # detail section; count detail headers like "(4) Exchange" only
    import re

    return len(re.findall(r"^\(\d+\) Exchange", plan, flags=re.M))


def test_sampling_plan_shapes(spark):
    """The 100 TB contract of sampling.py: split/sample are narrow
    scan-stage projections (zero exchanges, zero Python nodes);
    per_group_cap costs exactly one exchange (the group-key shuffle)."""
    df = spark.range(1000).select(
        F.col("id").cast("string").alias("k"),
        F.pmod("id", F.lit(7)).alias("grp"),
    )
    for narrow in (
        with_split(df, "k"),
        hash_sample(df, "k", 0.25),
        stratified_hash_sample(df, F.col("grp").cast("string"), {"1": 0.5}, key="k"),
    ):
        plan = _plan(narrow)
        assert _exchanges(plan) == 0, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    capped = _plan(per_group_cap(df, ["grp"], ["k"], k=3))
    assert _exchanges(capped) == 1, capped


# --------------------------------------------------------- shuffle order


def test_shuffle_order_is_deterministic_permutation(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        shuffle_order_expr,
    )

    keys = _keys(400)
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = [r["k"] for r in df.orderBy(*shuffle_order_expr("k")).collect()]
    want = sorted(keys, key=lambda k: (spark_xxhash64([("long", 42), ("string", k)]), k))
    assert got == want
    assert got != sorted(keys)  # actually permutes
    # a different seed deals a different permutation (epoch reshuffle)
    other = [r["k"] for r in df.orderBy(*shuffle_order_expr("k", seed=43)).collect()]
    assert other != got and sorted(other) == sorted(got)


def test_target_bucket_threshold_integer_exact():
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        target_bucket_threshold,
    )

    assert target_bucket_threshold(500, 500) == 10_000   # keep all
    assert target_bucket_threshold(100, 500) == 10_000   # smaller than target
    assert target_bucket_threshold(2000, 500) == 2_500   # exact quarter
    assert target_bucket_threshold(6000, 500) == 833     # floor, not round
    # beyond bucket resolution the clamp over-keeps instead of
    # keeping nothing (hash_sample_target grows buckets first)
    assert target_bucket_threshold(10**9, 500) == 1
    with pytest.raises(ValueError):
        target_bucket_threshold(-1, 5)


def test_hash_sample_target_holds_size_and_subsets(spark):
    """The constant-cost knob: 3x the corpus, ~the same sampled count —
    and membership equals a plain hash_sample at the implied fraction
    (same buckets, same seed: the threshold is the only difference)."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators import sampling

    small = spark.range(0, 2000).withColumnRenamed("id", "k")
    big = spark.range(0, 6000).withColumnRenamed("id", "k")
    s_small = sampling.hash_sample_target(small, "k", 500)
    s_big = sampling.hash_sample_target(big, "k", 500)
    n_small, n_big = s_small.count(), s_big.count()
    # ~500 each despite 3x the corpus (hash uniformity: +-25%)
    assert 375 <= n_small <= 625, n_small
    assert 375 <= n_big <= 625, n_big
    # threshold parity with the explicit-fraction form at 2000 rows
    explicit = sampling.hash_sample(small, "k", 0.25)
    assert {r["k"] for r in s_small.collect()} == {
        r["k"] for r in explicit.collect()
    }


def test_mixture_fractions_math():
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        mixture_fractions,
    )

    # corpus 80/20, target 50/50: the smaller group binds (c = 20/0.5)
    f = mixture_fractions({"web": 80, "wiki": 20}, {"web": 0.5, "wiki": 0.5})
    assert f == {"web": 0.25, "wiki": 1.0}
    # unnormalized shares normalize
    f2 = mixture_fractions({"web": 80, "wiki": 20}, {"web": 1, "wiki": 1})
    assert f2 == f
    # group not in target -> dropped; empty target group -> raises
    f3 = mixture_fractions({"a": 10, "b": 10}, {"a": 1.0})
    assert f3 == {"a": 1.0}
    with pytest.raises(ValueError, match="no corpus weight"):
        mixture_fractions({"a": 10}, {"a": 0.5, "missing": 0.5})


def test_mixture_sample_hits_target_shares(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators import sampling

    rows = [(i, "web" if i < 8000 else "wiki") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = sampling.mixture_sample(
        df, "source", {"web": 0.5, "wiki": 0.5}, key="doc_id"
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["wiki"] == 2000  # binding group keeps everything
    # web downsamples to ~2000 (hash granularity: +-15%)
    assert 1700 <= counts["web"] <= 2300, counts
    # deterministic: same call, same kept keys
    again = sampling.mixture_sample(
        df, "source", {"web": 0.5, "wiki": 0.5}, key="doc_id"
    )
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_mixture_sample_incremental_day0_equals_batch_mixer(spark):
    """With an empty ledger the daily gate IS mixture_sample: same
    kept key set (the anchor-max delegation discipline), and the
    returned ledger accounts exactly the kept frame's weights."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators import sampling

    rows = [(i, "web" if i < 8000 else "wiki") for i in range(10_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    shares = {"web": 0.5, "wiki": 0.5}
    kept, ledger = sampling.mixture_sample_incremental(
        df, None, "source", shares
    )
    batch_mode = sampling.mixture_sample(df, "source", shares)
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in batch_mode.collect()
    )
    led = {r["source"]: r["kept_w"] for r in ledger.collect()}
    cnt = {
        r["source"]: r["n"]
        for r in kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert led == {g: float(n) for g, n in cnt.items()}


def test_mixture_sample_incremental_converges_and_self_corrects(spark):
    """Multi-day ingest: (day 1) a web-heavy batch admits wiki fully
    and web partially; (day 2) wiki is ABSENT — the gate does not
    stall, web tops up to its entitlement, the running mix drifts;
    (day 3) wiki returns and keeps EVERYTHING offered (its accumulated
    entitlement exceeds supply) — the drift self-corrects and the
    running shares land near 50/50. Per-day kept weights match the
    water-filling math within bucket granularity, over-represented
    groups keep zero, and unknown groups drop."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators import sampling

    shares = {"web": 0.5, "wiki": 0.5}

    def mk(start, n_web, n_wiki, n_junk=0):
        rows = [(start + i, "web") for i in range(n_web)]
        rows += [(start + 100_000 + i, "wiki") for i in range(n_wiki)]
        rows += [(start + 200_000 + i, "junk") for i in range(n_junk)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def counts(df):
        return {
            r["source"]: r["n"]
            for r in df.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }

    # day 1: 8000 web / 1000 wiki (+ junk, not in the recipe)
    k1, l1 = sampling.mixture_sample_incremental(
        mk(0, 8000, 1000, n_junk=500), None, "source", shares
    )
    c1 = counts(k1)
    assert "junk" not in c1
    assert c1["wiki"] == 1000                      # binding: keeps all
    assert 850 <= c1["web"] <= 1150                # ~1000 (granularity)

    # day 2: wiki absent; T = (c_web + b_web)/0.5 is the only cap, so
    # web's entitlement T*0.5 - c_web = b_web: web keeps EVERYTHING
    k2, l2 = sampling.mixture_sample_incremental(
        mk(1_000_000, 3000, 0), l1, "source", shares
    )
    c2 = counts(k2)
    assert c2["web"] == 3000 and "wiki" not in c2

    led2 = {r["source"]: r["kept_w"] for r in l2.collect()}
    # day 3: wiki floods back; entitlement T*s - c_wiki >= supply for
    # a 3000-doc wiki batch (web is now ~4x over), so wiki keeps all
    # and web keeps ~nothing
    k3, l3 = sampling.mixture_sample_incremental(
        mk(2_000_000, 2000, 3000), l2, "source", shares
    )
    c3 = counts(k3)
    assert c3["wiki"] == 3000
    assert c3.get("web", 0) <= 250  # over-represented: ~zero admitted

    led3 = {r["source"]: r["kept_w"] for r in l3.collect()}
    # ledger ≡ sum of actual kept weights across the three days
    assert led3["wiki"] == float(c1["wiki"] + 3000)
    assert led3["web"] == float(c1["web"] + 3000 + c3.get("web", 0))
    # running shares converged near the recipe
    tot = sum(led3.values())
    assert abs(led3["wiki"] / tot - 0.5) < 0.07, led3
    # water-filling twin for day 3: T = min((c_g+b_g)/s_g) over
    # supplied groups; expected wiki keep = min(max(T*s-c,0),b)
    t3 = min(
        (led2.get("web", 0.0) + 2000) / 0.5,
        (led2.get("wiki", 0.0) + 3000) / 0.5,
    )
    want_wiki = min(max(t3 * 0.5 - led2.get("wiki", 0.0), 0.0), 3000)
    assert c3["wiki"] == want_wiki  # fraction 1.0 — no granularity blur

    # replay determinism: re-running day 3 yields the same kept keys
    k3b, _ = sampling.mixture_sample_incremental(
        mk(2_000_000, 2000, 3000), l2, "source", shares
    )
    assert sorted(r["doc_id"] for r in k3.collect()) == sorted(
        r["doc_id"] for r in k3b.collect()
    )


def test_mixture_ledger_fractions_properties():
    """Hypothesis sweep over the pure water-filling core: fractions
    stay in [0, 1]; at least one supplied target group is BINDING
    (keeps all its supply, or sits at/above its entitlement); no group
    ends above max(history, T*share) — the no-upsample/no-overshoot
    invariant; and with empty history the fractions equal
    mixture_fractions over the supplied groups (the one-shot mixer's
    math, delegated not re-derived)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from topn_clashroyal_etl_sql_snapshot_spark.operators import sampling

    groups = st.lists(
        st.sampled_from(["web", "wiki", "books", "code", "news"]),
        min_size=1, max_size=5, unique=True,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        gs=groups,
        data=st.data(),
    )
    def run(gs, data):
        # zero or a sensibly-sized weight: denormal supplies (5e-324)
        # get absorbed by large histories in (hist + supply) and turn
        # the properties into FP-absorption trivia, a regime no weight
        # unit (docs/chars/tokens) produces
        pos = st.one_of(
            st.just(0.0),
            st.floats(1e-3, 1e6, allow_nan=False, allow_infinity=False),
        )
        share = st.floats(0.01, 1.0, allow_nan=False)
        hist = {g: data.draw(pos) for g in gs}
        supply = {g: data.draw(pos) for g in gs}
        shares = {g: data.draw(share) for g in gs}
        fracs = sampling.mixture_ledger_fractions(hist, supply, shares)
        supplied = {g for g in gs if supply[g] > 0}
        if not supplied:
            assert fracs == {}
            return
        assert set(fracs) == supplied
        tot = sum(shares.values())
        t = min((hist[g] + supply[g]) / (shares[g] / tot) for g in supplied)
        for g, f in fracs.items():
            assert -1e-12 <= f <= 1 + 1e-12
            kept = f * supply[g]
            # never lifted above entitlement (modulo FP slack)
            assert hist[g] + kept <= max(hist[g], t * shares[g] / tot) * (
                1 + 1e-9
            ) + 1e-9
        # the binding group's fraction is 1 (it defined T) — up to
        # CANCELLATION slack: its keep is T·s − hist, and with
        # hist ≫ supply (hypothesis found hist=131072, supply=0.001)
        # the subtraction loses ~log2(hist/supply) bits, so the
        # fraction can sit ~1e-8 off exact 1.0; the operator clamps to
        # [0, supply] regardless, so this is test-reconstruction
        # arithmetic, not an operator hazard
        binding = min(
            supplied, key=lambda g: (hist[g] + supply[g]) / (shares[g] / tot)
        )
        assert fracs[binding] >= 1 - 1e-6

        # empty history ≡ the one-shot mixer's fractions on the
        # supplied slice
        zero_hist = {g: 0.0 for g in gs}
        fr0 = sampling.mixture_ledger_fractions(zero_hist, supply, shares)
        supplied_shares = {g: shares[g] for g in supplied}
        want = sampling.mixture_fractions(
            {g: supply[g] for g in supplied}, supplied_shares
        )
        for g in supplied:
            assert abs(fr0[g] - want[g]) < 1e-9, (g, fr0[g], want[g])

    run()


def test_per_group_quantile_cap_matches_duckdb(spark):
    """Percentile gate vs a DuckDB window oracle: keep the top 30% per
    source by score (ties broken by doc_id), ceil keeps >=1 per group."""
    import duckdb

    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        per_group_quantile_cap,
    )

    import random

    rng = random.Random(4)
    rows = [
        (i, ["a", "b", "c"][i % 3], round(rng.random(), 6)) for i in range(100)
    ] + [(100, "solo", 0.5)]  # single-row group survives any fraction
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = sorted(
        r["doc_id"]
        for r in per_group_quantile_cap(
            df, ["source"], [F.desc("score"), F.asc("doc_id")], 0.3
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, source VARCHAR, score DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        r[0]
        for r in con.execute("""
            SELECT doc_id FROM (
              SELECT doc_id,
                     ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY score DESC, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY source) AS n
              FROM t
            ) WHERE rn <= CAST(ceil(round(n * 0.3, 9)) AS BIGINT)
        """).fetchall()
    )
    assert got == want
    assert 100 in got  # the singleton group kept its row
    with pytest.raises(ValueError, match="keep_frac"):
        per_group_quantile_cap(df, ["source"], [F.asc("doc_id")], 0.0)


def test_hash_sample_target_grows_buckets_at_scale(spark):
    """>5M-row regime (here forced with a tiny bucket space): the
    bucket space grows so the sampled count stays ~on target instead
    of collapsing to zero (r7 review finding)."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators import sampling

    df = spark.range(0, 50_000).withColumnRenamed("id", "k")
    # default 10^4 buckets: fine (threshold 100 exactly at the margin)
    n = sampling.hash_sample_target(df, "k", 500).count()
    assert 350 <= n <= 650, n
    # tiny bucket space would floor to 0 without growth
    n2 = sampling.hash_sample_target(df, "k", 500, buckets=100).count()
    assert 350 <= n2 <= 650, n2


def test_unregistered_per_group_cap_query_still_runs(spark):
    """docs_per_group_cap rotated out of the driver registry in r7 but
    stays a callable query surface — keep it exercised so it cannot
    silently rot (review finding)."""
    from topn_clashroyal_etl_sql_snapshot_spark.plans.llm_queries import (
        docs_per_group_cap,
    )

    rows = docs_per_group_cap(spark, "/root/testdata/sf0.001").collect()
    assert rows and set(rows[0].asDict()) == {"doc_id", "source", "n_chars"}
    per_source: dict[str, int] = {}
    for r in rows:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert all(n <= 5 for n in per_source.values())


# ------------------------------------------------- upsampling mixtures


def _py_bucket(key: int, seed: int = 42, buckets: int = DEFAULT_BUCKETS) -> int:
    return spark_xxhash64([("long", seed), ("long", key)]) % buckets


def _mix_corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for g, n in sorted(sizes.items()):
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_multipliers_anchors_and_budget():
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        mixture_multipliers,
    )

    w = {"wiki": 100.0, "crawl": 900.0}
    tgt = {"wiki": 0.5, "crawl": 0.5}
    down = mixture_multipliers(w, tgt, anchor="max")
    assert down["wiki"] == 1.0 and abs(down["crawl"] - 100 / 900) < 1e-12
    up = mixture_multipliers(w, tgt, anchor="min")
    assert up["crawl"] == 1.0 and abs(up["wiki"] - 9.0) < 1e-12
    budget = mixture_multipliers(w, tgt, total=500.0)
    # kept weight per group = 250 each
    assert abs(budget["wiki"] - 2.5) < 1e-12
    assert abs(budget["crawl"] - 250 / 900) < 1e-12
    # dropped / unsatisfiable / bad params
    assert mixture_multipliers(w, {"wiki": 1.0})["crawl"] == 0.0
    with pytest.raises(ValueError):
        mixture_multipliers(w, {"books": 1.0})
    with pytest.raises(ValueError):
        mixture_multipliers(w, tgt, anchor="median")
    with pytest.raises(ValueError):
        mixture_multipliers(w, tgt, total=0.0)


def test_replicate_by_multiplier_matches_python_twin(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        replicate_by_multiplier,
    )

    df = _mix_corpus(spark, {"a": 40, "b": 40})
    mult = {"a": 2.25, "b": 0.5}
    out = replicate_by_multiplier(df, mult, "source", key="doc_id").collect()
    got: dict[int, list[int]] = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(r["epoch"])
    for r in df.collect():
        rg = mult[r["source"]]
        whole = int(rg)
        thr = int(round((rg - whole) * DEFAULT_BUCKETS))
        n = whole + (1 if _py_bucket(r["doc_id"]) < thr else 0)
        if n == 0:
            assert r["doc_id"] not in got
        else:
            assert sorted(got[r["doc_id"]]) == list(range(n)), r["doc_id"]


def test_replicate_fuse_and_validation(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        replicate_by_multiplier,
    )

    df = _mix_corpus(spark, {"a": 3})
    with pytest.raises(ValueError):
        replicate_by_multiplier(df, {"a": 101.0}, "source")
    with pytest.raises(ValueError):
        replicate_by_multiplier(df, {"a": -0.5}, "source")
    # raising the fuse deliberately works
    n = replicate_by_multiplier(
        df, {"a": 101.0}, "source", max_multiplier=200.0
    ).count()
    assert n >= 3 * 101


def test_mixture_resample_hits_target_shares(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        mixture_resample,
    )

    df = _mix_corpus(spark, {"wiki": 200, "crawl": 1800})
    out = mixture_resample(
        df, "source", {"wiki": 0.5, "crawl": 0.5}, key="doc_id"
    )
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # anchor="min": crawl intact, wiki replicated ~9x; realized shares
    # carry bucket-granularity noise
    assert counts["crawl"] == 1800
    assert abs(counts["wiki"] - 1800) <= 1800 * 0.07
    # every crawl doc exactly once, epoch 0
    assert (
        out.filter((F.col("source") == "crawl") & (F.col("epoch") != 0)).count()
        == 0
    )


def test_mixture_resample_downsample_anchor_matches_mixture_sample(spark):
    """anchor="max" (downsample-only) keeps the SAME key set as
    mixture_sample for the same target — the two operators share the
    bucket-membership rule, so the unified replicate form really is a
    superset of the fraction form."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        mixture_resample,
        mixture_sample,
    )

    df = _mix_corpus(spark, {"wiki": 300, "crawl": 700})
    tgt = {"wiki": 0.4, "crawl": 0.6}
    a = {
        r["doc_id"]
        for r in mixture_resample(
            df, "source", tgt, key="doc_id", anchor="max"
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in mixture_sample(df, "source", tgt, key="doc_id").collect()
    }
    assert a == b


def test_mixture_resample_deterministic_and_replayable(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        mixture_resample,
    )

    df = _mix_corpus(spark, {"a": 50, "b": 150})
    tgt = {"a": 0.5, "b": 0.5}
    r1 = sorted(
        (r["doc_id"], r["epoch"])
        for r in mixture_resample(df, "source", tgt).collect()
    )
    r2 = sorted(
        (r["doc_id"], r["epoch"])
        for r in mixture_resample(df, "source", tgt).collect()
    )
    assert r1 == r2


def test_replicate_plan_is_narrow(spark):
    """The replicate projection must not shuffle: no Exchange in the
    plan (scan → filter/project/generate only)."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        replicate_by_multiplier,
    )

    df = _mix_corpus(spark, {"a": 5, "b": 5})
    plan = (
        replicate_by_multiplier(df, {"a": 1.5, "b": 0.5}, "source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
    assert "BatchEvalPython" not in plan


def test_mixture_resample_matches_duckdb_oracle(spark):
    """Upsampling to the driver's oracle bar: an independent DuckDB
    query reproduces every (doc_id, epoch) copy — the xxh64 bucket
    recomputed bit-for-bit via the generated CTE chain
    (plans/xxh64_sql.py), the floor/fractional copy rule in SQL
    arithmetic, epochs via generate_series."""
    import duckdb

    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        mixture_resample,
    )
    from topn_clashroyal_etl_sql_snapshot_spark.plans.xxh64_sql import (
        xxh64_bucket_ctes,
    )

    df = _mix_corpus(spark, {"wiki": 80, "crawl": 320})
    tgt = {"wiki": 0.5, "crawl": 0.5}
    got = sorted(
        (r["doc_id"], r["epoch"])
        for r in mixture_resample(df, "source", tgt, key="doc_id").collect()
    )

    # multipliers recomputed in the test (anchor="min"): crawl 1.0,
    # wiki 320/80 = 4.0 — embed as floor + fractional threshold
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        DEFAULT_BUCKETS,
        mixture_multipliers,
    )

    weights = {"wiki": 80.0, "crawl": 320.0}
    mult = mixture_multipliers(weights, tgt, anchor="min")
    cases = " ".join(
        f"WHEN source = '{g}' THEN {int(r)} + "
        f"(CASE WHEN _bucket < {int(round((r - int(r)) * DEFAULT_BUCKETS))} "
        f"THEN 1 ELSE 0 END)"
        for g, r in mult.items()
    )
    pdf = df.toPandas()
    con = duckdb.connect()
    con.register("docs", pdf)
    sql = f"""
    WITH {xxh64_bucket_ctes("docs", "doc_id", DEFAULT_BUCKETS)},
    nc AS (
      SELECT d.doc_id, (CASE {cases} ELSE 0 END) AS n_copies
      FROM docs d JOIN _xxbkt USING (doc_id)
    )
    SELECT doc_id, CAST(e AS BIGINT) AS epoch
    FROM nc, UNNEST(generate_series(0, n_copies - 1)) AS t(e)
    WHERE n_copies > 0
    ORDER BY doc_id, epoch
    """
    oracle = [(r[0], r[1]) for r in con.execute(sql).fetchall()]
    assert got == oracle


def test_split_by_component_is_leakage_safe_and_twin_exact(spark):
    """Every member of a near-dup component must land in the SAME
    split (the leakage guarantee a per-doc hash split cannot give);
    singletons absent from the labels frame bucket on their own id —
    identical to carrying their singleton component label. The
    assignment is re-derived end-to-end with the pure-Python xxh64
    twin (bucket of coalesce(comp, doc_id) → cumulative-threshold
    label) and must match exactly."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup
    from topn_clashroyal_etl_sql_snapshot_spark.operators.sampling import (
        _cumulative_thresholds,
        split_by_component,
    )

    # components: {1,2,3} (chain), {10,11}; 20/21/22 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id1 long, id2 long"
    )
    labels = dedup.connected_components(pairs)
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 10, 11, 20, 21, 22)],
        "doc_id long, text string",
    )
    weights = {"train": 0.6, "val": 0.2, "test": 0.2}
    got = {
        r["doc_id"]: r["split"]
        for r in split_by_component(docs, labels, weights).collect()
    }

    # leakage guarantee: components agree internally
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11]

    # twin: comp label (min id) for paired docs, own id for singletons
    comp_of = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 21, 22: 22}
    thresholds = _cumulative_thresholds(weights, DEFAULT_BUCKETS)

    def twin_split(key: int) -> str:
        b = spark_xxhash64([("long", 42), ("long", key)]) % DEFAULT_BUCKETS
        for name, t in thresholds:
            if b < t:
                return name
        raise AssertionError("unreachable")

    assert got == {d: twin_split(c) for d, c in comp_of.items()}

    # and the schema carries the original doc columns plus split
    out = split_by_component(docs, labels, weights)
    assert set(out.columns) == {"doc_id", "text", "split"}
