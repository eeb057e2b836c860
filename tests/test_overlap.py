"""Cross-document overlap tests (operators/overlap.py): the winnowing
shared-paragraph guarantee, containment vs Jaccard separation, Python
and DuckDB oracles, df-cap behavior, and plan shape."""

from __future__ import annotations

import random
import re

import duckdb
import pytest

from topn_clashroyal_etl_sql_snapshot_spark.operators import overlap


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split() if t]


def _ngrams(text: str, n: int) -> set[str]:
    toks = _tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
    "lima mike november oscar papa quebec romeo sierra tango"
).split()


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(77)

    def rand_text(n):
        return " ".join(rng.choice(WORDS) for _ in range(n))

    paragraph = "the shared license boilerplate paragraph appears verbatim here"
    short = "a tiny document fully contained elsewhere"
    docs = [
        (1, rand_text(80) + " " + paragraph + " " + rand_text(80)),
        (2, rand_text(90) + " " + paragraph + " " + rand_text(70)),
        (3, rand_text(150)),                       # unrelated
        (4, short),
        (5, rand_text(60) + " " + short + " " + rand_text(60)),  # contains 4
    ]
    return spark.createDataFrame(docs, "doc_id long, text string"), docs


def test_shared_paragraph_guarantee_and_python_oracle(spark, corpus):
    """Docs 1 and 2 share a 9-token paragraph ≥ window+k-1 = 6 tokens:
    the pair MUST appear. n_shared must equal the Python winnowing
    twin's shared-fingerprint count for every emitted pair."""
    df, docs = corpus
    got = {
        (r["id1"], r["id2"]): r
        for r in overlap.winnow_overlap_pairs(df, k=3, window=4).collect()
    }
    assert (1, 2) in got

    def py_selected(text):
        toks = _tokens(text)
        import hashlib

        grams = [
            hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
            for i in range(len(toks) - 2)
        ]
        # r11 fix: selected set = DISTINCT trailing-window minima
        return {
            min(grams[max(0, i - 3) : i + 1]) for i in range(len(grams))
        }

    sel = {i: py_selected(t) for i, t in docs}
    for (i1, i2), r in got.items():
        assert r["n_shared"] == len(sel[i1] & sel[i2]), (i1, i2)
        assert r["n_fp1"] == len(sel[i1]) and r["n_fp2"] == len(sel[i2])
        assert r["overlap1"] == pytest.approx(r["n_shared"] / len(sel[i1]))
    # every python-side sharing pair is present (full recall of the index)
    want_pairs = {
        (a, b)
        for a in sel
        for b in sel
        if a < b and sel[a] & sel[b]
    }
    assert set(got) == want_pairs


def test_containment_catches_what_jaccard_misses(spark, corpus):
    df, docs = corpus
    rows = {
        (r["id1"], r["id2"]): r
        for r in overlap.containment_pairs(df, n=3, threshold=0.8).collect()
    }
    assert (4, 5) in rows
    r = rows[(4, 5)]
    # the short doc's trigram set is fully inside the long one
    assert r["containment"] == 1.0
    # while global jaccard is small — the shape jaccard_pairs misses
    assert r["jaccard"] < 0.1
    # python oracle for the counts
    a, b = _ngrams(docs[3][1], 3), _ngrams(docs[4][1], 3)
    assert r["n_common"] == len(a & b)
    assert (r["n1"], r["n2"]) == (len(a), len(b))


def test_containment_duckdb_oracle(spark, corpus):
    df, docs = corpus
    got = {
        (r["id1"], r["id2"]): (r["n_common"], r["containment"], r["jaccard"])
        for r in overlap.containment_pairs(df, n=3, threshold=0.5).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    orows = con.execute("""
        WITH base AS (
          SELECT doc_id, list_filter(string_split_regex(lower(
            regexp_replace(text, '[^a-zA-Z0-9 ]', ' ', 'g')), '\\s+'),
            x -> x <> '') AS toks
          FROM documents
        ),
        tri AS (
          SELECT DISTINCT doc_id,
                 toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
          FROM base, UNNEST(generate_series(1, len(toks) - 2)) AS t(i)
          WHERE len(toks) >= 3
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM tri GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
          FROM tri a JOIN tri b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT id1, id2, c,
               CAST(c AS DOUBLE) / least(s1.n, s2.n) AS containment,
               CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = id1
        JOIN sizes s2 ON s2.doc_id = id2
        WHERE CAST(c AS DOUBLE) / least(s1.n, s2.n) >= 0.5
    """).fetchall()
    assert got == {(i1, i2): (c, ct, j) for i1, i2, c, ct, j in orows}


def test_df_cap_drops_boilerplate_keys(spark):
    """A fingerprint present in every document is boilerplate: with
    max_df below the corpus size it stops generating candidates."""
    common = "identical boilerplate sentence shared by absolutely every document"
    docs = [(i, common) for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    full = overlap.winnow_overlap_pairs(df, max_df=None).count()
    capped = overlap.winnow_overlap_pairs(df, max_df=4).count()
    assert full == 8 * 7 // 2 and capped == 0


def test_no_cartesian_plan(spark, corpus):
    df, _ = corpus
    for q in (
        overlap.winnow_overlap_pairs(df),
        overlap.containment_pairs(df),
    ):
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_winnow_guarantee_randomized_minimal_overlap(spark):
    """The regression the r11 winnowing fix exists for: 40 document
    pairs sharing EXACTLY window+k-1 = 6 consecutive tokens embedded
    in otherwise-disjoint vocabularies — every pair MUST surface
    (min_shared=1). Under the pre-r11 h==wmin selection this failed
    for ~37% of such pairs (the shared run's window minimum was not
    the minimum of the one window ending at its own position)."""
    import random

    rng = random.Random(99)
    # disjoint per-doc vocabularies so ONLY the planted run is shared
    rows = []
    for p in range(40):
        shared = " ".join(f"sh{p}x{j}" for j in range(6))  # 6 tokens
        va = [f"a{p}w{i}" for i in range(30)]
        vb = [f"b{p}w{i}" for i in range(30)]
        ta = " ".join(rng.choice(va) for _ in range(60))
        tb = " ".join(rng.choice(vb) for _ in range(60))
        rows.append((2 * p, ta + " " + shared + " " + " ".join(
            rng.choice(va) for _ in range(40))))
        rows.append((2 * p + 1, " ".join(
            rng.choice(vb) for _ in range(40)) + " " + shared + " " + tb))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id1"], r["id2"])
        for r in overlap.winnow_overlap_pairs(
            df, k=3, window=4, min_shared=1, max_df=None
        ).collect()
    }
    missing = [
        (2 * p, 2 * p + 1) for p in range(40) if (2 * p, 2 * p + 1) not in pairs
    ]
    assert not missing, f"guarantee violated for {len(missing)} pairs: {missing[:5]}"
