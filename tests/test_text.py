"""Unit tests for the text-analysis expression library."""

from __future__ import annotations

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).first()["v"]


def test_tokens_and_counts(spark):
    assert _one(spark, "Hello, World! 42", F.struct(tx.tokens(F.col("text")))) is not None
    toks = _one(spark, "  Hello, World! 42\nnew-line ", tx.tokens(F.col("text")))
    assert toks == ["hello", "world", "42", "new", "line"]
    assert _one(spark, "a b c", tx.token_count(F.col("text"))) == 3
    assert _one(spark, "", tx.token_count(F.col("text"))) == 0


def test_shingles(spark):
    df = spark.createDataFrame([(["a", "b", "c", "d"],)], "toks array<string>")
    got = df.select(tx.shingles(F.col("toks"), 3).alias("s")).first()["s"]
    assert got == ["a b c", "b c d"]
    short = spark.createDataFrame([(["a", "b"],)], "toks array<string>")
    assert short.select(tx.shingles(F.col("toks"), 3).alias("s")).first()["s"] == []


def test_shingles_distinct(spark):
    df = spark.createDataFrame([(["x", "x", "x", "x"],)], "toks array<string>")
    got = df.select(tx.shingles(F.col("toks"), 3).alias("s")).first()["s"]
    assert got == ["x x x"]


def test_punct_and_stopword_ratio(spark):
    assert _one(spark, "ab!!", tx.punct_ratio(F.col("text"))) == 0.5
    # "the cat and dog": 2 of 4 tokens are stopwords
    assert _one(spark, "the cat and dog", tx.stopword_ratio(F.col("text"))) == 0.5


def test_lang_id_markers(spark):
    cases = {
        "the cat and the dog is here": "en",
        "el gato los perros una casa": "es",
        "le chat les chiens une maison est": "fr",
        "der hund die katze und nicht ist": "de",
        "xyzzy plugh foobar": "und",
    }
    for text, want in cases.items():
        assert _one(spark, text, tx.lang_id(F.col("text"))) == want, text


def test_lang_id_cjk(spark):
    assert _one(spark, "你好 world", tx.lang_id(F.col("text"))) == "zh"


def test_quality_score_range(spark):
    docs = [
        "word " * 150,            # long clean text
        "a",                      # tiny
        "!!!! ???? ;;;; ####",    # pure punctuation
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    vals = [r[0] for r in df.select(tx.quality_score(F.col("text"))).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert vals[0] > vals[2]  # clean text beats punctuation soup


def test_content_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello, World!",), ("hello  world ",), ("hello world",)], "text string"
    )
    fps = [r[0] for r in df.select(tx.content_fingerprint(F.col("text"))).collect()]
    # punctuation maps to spaces: "Hello, World!" ≡ "hello  world "
    assert fps[0] == fps[1]
    # but whitespace multiplicity is preserved (fingerprint is over the
    # normalized string, not the token join)
    assert fps[0] != fps[2]

    df2 = spark.createDataFrame([("abc def",), ("ABC DEF",)], "text string")
    fps2 = [r[0] for r in df2.select(tx.content_fingerprint(F.col("text"))).collect()]
    assert fps2[0] == fps2[1]


def test_lang_id_table_matches_expression(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import lang_id_table

    texts = [
        "the cat and the dog is here",
        "el gato los perros una casa",
        "le chat les chiens une maison est",
        "der hund die katze und nicht ist",
        "xyzzy plugh foobar",
        "你好 world",
        "",
        "the el le der",  # tie across all four → en by LANG_ORDER
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rel = {
        r["doc_id"]: r["predicted_lang"]
        for r in lang_id_table(df).collect()
    }
    expr = {
        r["doc_id"]: r["p"]
        for r in df.select("doc_id", tx.lang_id(F.col("text")).alias("p")).collect()
    }
    assert rel == expr
    assert rel[7] == "en"


def test_winnow_fingerprint_guarantee(spark):
    """Winnowing invariant: ≥1 fingerprint per full window → any two
    documents sharing window+k-1 consecutive tokens share a selected
    fingerprint; density lands near 2/(w+1)."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (
        winnow_fingerprints,
    )

    import random

    rng = random.Random(13)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    body = " ".join(rng.choice(words) for _ in range(200))
    shared = "one two three four five six"  # 6 tokens = window+k-1
    docs = spark.createDataFrame(
        [
            (1, body + " " + shared),
            (2, shared + " " + " ".join(rng.choice(words) for _ in range(150))),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in winnow_fingerprints(docs, k=3, window=4).collect()}
    for d in (1, 2):
        assert out[d]["n_fingerprints"] >= 1
        assert 0 < out[d]["density"] <= 1.0
        # density concentrates near 2/(w+1) = 0.4 for random text
        assert 0.2 <= out[d]["density"] <= 0.7

    # the shared 6-token run yields at least one common selected hash:
    # verify via the underlying selection, re-deriving per doc
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx

    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.posexplode(tx.tokens(F.col("text"))).alias("pos", "tok"),
    )
    w_doc = W.partitionBy("id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w_doc) for j in range(1, 3)]
    grams = (
        toks.select("id", "pos", F.md5(F.concat_ws(" ", *leads)).alias("h"),
                    leads[-1].alias("_l"))
        .filter(F.col("_l").isNotNull())
    )
    sel = (
        grams.withColumn(
            "wmin", F.min("h").over(W.partitionBy("id").orderBy("pos").rowsBetween(-3, 0))
        )
        .filter(F.col("h") == F.col("wmin"))
        .select("id", "h")
        .distinct()
    )
    a = {r["h"] for r in sel.filter(F.col("id") == 1).collect()}
    b = {r["h"] for r in sel.filter(F.col("id") == 2).collect()}
    assert a & b, "documents sharing a 6-token run must share a fingerprint"


def test_bpe_pretokens_gpt2_style(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.functions.text import bpe_pretokens
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("It's 2026, naïve test-case!",)], "text string")
    toks = df.select(bpe_pretokens(F.col("text")).alias("t")).first()["t"]
    # contraction split, leading-space attachment, digit/punct runs
    assert toks == ["It", "'s", " 2026", ",", " naïve", " test", "-", "case", "!"]
