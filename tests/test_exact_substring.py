"""ExactSubstr dedup tests (dedup.exact_substring_spans/_excise, the
Lee et al. 2022 recipe as relational algebra): spans and excision vs a
pure-Python oracle, canonical-copy survival, self-repeats, the
min_tokens threshold, and full-row/NULL contracts."""

from __future__ import annotations

import re

import pytest

from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split() if t]


def _py_spans(corpus, min_tokens):
    """Oracle: duplicated positional L-gram occurrences, minus each
    gram's min-(doc, pos) canonical, merged into per-doc intervals."""
    occs: dict[str, list[tuple[int, int]]] = {}
    for i, t in corpus:
        if t is None:
            continue
        toks = _tokens(t)
        for p in range(len(toks) - min_tokens + 1):
            occs.setdefault(" ".join(toks[p : p + min_tokens]), []).append((i, p))
    covered: dict[int, set[int]] = {}
    for g, where in occs.items():
        if len(where) < 2:
            continue
        first = min(where)
        for i, p in where:
            if (i, p) != first:
                covered.setdefault(i, set()).update(range(p, p + min_tokens))
    return covered


WORDS = "one two three four five six seven eight nine ten".split()


def _noise(rng, n):
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def repeated_corpus(spark):
    import random

    rng = random.Random(17)
    # a 12-token passage repeated verbatim across three docs and twice
    # inside one of them; an 11-token passage repeated once (above L);
    # a 7-token repeat (below L=8: must be untouched)
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    sub = "red orange yellow green blue indigo violet ultra"  # 8 tokens
    short = "aa bb cc dd ee ff gg"  # 7 tokens
    corpus = [
        (1, _noise(rng, 10) + " " + passage + " " + _noise(rng, 10)),
        (2, passage + " " + _noise(rng, 15)),
        (3, _noise(rng, 5) + " " + passage + " tail " + passage),
        (4, _noise(rng, 12) + " " + sub + " " + _noise(rng, 3)),
        (5, sub + " " + _noise(rng, 14)),
        (6, short + " " + _noise(rng, 20)),
        (7, _noise(rng, 20) + " " + short),
        (8, None),
        (9, ""),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    return df, corpus


def test_spans_match_python_oracle(spark, repeated_corpus):
    df, corpus = repeated_corpus
    L = 8
    got: dict[int, set[int]] = {}
    for r in dedup.exact_substring_spans(df, min_tokens=L).collect():
        got.setdefault(r["doc_id"], set()).update(
            range(r["span_start"], r["span_end"])
        )
    assert got == _py_spans(corpus, L)


def test_excise_keeps_exactly_one_copy(spark, repeated_corpus):
    df, corpus = repeated_corpus
    L = 8
    out = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in dedup.exact_substring_excise(df, min_tokens=L).collect()
    }
    assert set(out) == {i for i, _ in corpus}
    covered = _py_spans(corpus, L)
    for i, t in corpus:
        if t is None:
            assert out[i] == (None, 0, 0)
            continue
        toks = _tokens(t)
        cov = covered.get(i, set())
        kept = [tok for p, tok in enumerate(toks) if p not in cov]
        assert out[i] == (" ".join(kept), len(kept), len(toks) - len(kept)), i

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    # the canonical copy (doc 1 holds the min (doc, pos) grams) survives;
    # every other copy — including doc 3's SECOND internal repeat — dies
    all_text = " || ".join(out[i][0] for i in (1, 2, 3))
    assert all_text.count(passage) == 1
    assert passage in out[1][0]
    # the 8-token repeat dedups the same way
    assert (out[4][0] + " || " + out[5][0]).count(
        "red orange yellow green blue indigo violet ultra"
    ) == 1
    # the 7-token repeat is below threshold: both copies intact
    assert "aa bb cc dd ee ff gg" in out[6][0]
    assert "aa bb cc dd ee ff gg" in out[7][0]


def test_no_duplicates_no_changes(spark):
    docs = spark.createDataFrame(
        [(1, "completely unique words nobody repeats anywhere at all today"),
         (2, "another entirely different sentence with fresh vocabulary")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in dedup.exact_substring_excise(docs, min_tokens=5).collect()
    }
    assert out[1][1] == 0 and out[2][1] == 0
    assert out[1][0] > 0 and out[2][0] > 0


def test_spans_plan_no_cartesian_no_python(spark, repeated_corpus):
    df, _ = repeated_corpus
    plan = (
        dedup.exact_substring_excise(df, min_tokens=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
