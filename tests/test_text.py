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
        # distinct-window-minima density for random text sits a bit
        # above the 2/(w+1)=0.4 position density (partial head windows
        # add a few, repeats collapse)
        assert 0.2 <= out[d]["density"] <= 0.8

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
        # r11 fix: the selected set is the DISTINCT window minima —
        # the old h==wmin filter broke the sharing guarantee
        .select("id", F.col("wmin").alias("h"))
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


def test_scrub_pii_matches_python_re(spark):
    """Every scrub pattern is Java/Python-portable by construction; the
    composed scrub must equal re.sub in the same order, row for row."""
    import re

    from pyspark.sql import functions as F

    from topn_clashroyal_etl_sql_snapshot_spark.functions import cleaning as cl

    rows = [
        "contact me at alice.smith+spam@example.co.uk or bob@x.io today",
        "see https://example.com/a?b=c&d=e#f and www.test.org/path now",
        "server at 192.168.1.250 answered, backup 10.0.0.7 did not",
        "call +1 555 123-4567 or (020) 7946 0958 before 2024",
        "mixed: visit http://u:p@host.com/x email u:p@host.com 1.2.3.4",
        "no pii here, just year 2024 and id 123456789",
        "released 2024-01-15, version v2024.08.13, price 10 000 000 USD",
        "",
    ]

    def py_scrub(s):
        s = re.sub(cl.URL_PATTERN, "<URL>", s)
        s = re.sub(cl.EMAIL_PATTERN, "<EMAIL>", s)
        s = re.sub(cl.IPV4_PATTERN, "<IP>", s)
        s = re.sub(cl.PHONE_PATTERN, "<PHONE>", s)
        return s

    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "i long, t string")
    got = {
        r["i"]: r["s"]
        for r in df.select("i", cl.scrub_pii(F.col("t")).alias("s")).collect()
    }
    for i, t in enumerate(rows):
        assert got[i] == py_scrub(t), (t, got[i], py_scrub(t))
    # counts agree too
    cnt_row = (
        df.select(*[c.alias(k) for k, c in cl.pii_counts(F.col("t")).items()])
        .groupBy()
        .sum()
        .collect()[0]
    )
    # counts are taken on the progressively scrubbed text, mirroring
    # what scrub_pii actually redacts per category
    joined = "\n".join(rows)
    after_urls = re.sub(cl.URL_PATTERN, "<URL>", joined)
    after_emails = re.sub(cl.EMAIL_PATTERN, "<EMAIL>", after_urls)
    after_ips = re.sub(cl.IPV4_PATTERN, "<IP>", after_emails)
    assert cnt_row[0] == len(re.findall(cl.URL_PATTERN, joined))
    assert cnt_row[1] == len(re.findall(cl.EMAIL_PATTERN, after_urls))
    assert cnt_row[2] == len(re.findall(cl.IPV4_PATTERN, after_emails))
    assert cnt_row[3] == len(re.findall(cl.PHONE_PATTERN, after_ips))


def test_unicode_hygiene_matches_python(spark):
    """Control/zero-width strip + space normalization + FFFD ratio
    must equal the Python-re twins row for row; NFC normalization must
    equal unicodedata.normalize with canonical-equivalence semantics."""
    import re
    import unicodedata

    from pyspark.sql import functions as F

    from topn_clashroyal_etl_sql_snapshot_spark.functions import cleaning as cl

    rows = [
        "plain ascii stays",
        "bell\x07 null\x00 del\x7f c1\x85 kept\ttab\nnewline\rcr",
        "zero\u200bwidth\u200cjoin\u200der bom\ufeff end",
        "nb\u00a0sp en\u2000quad thin\u2009sp ideo\u3000space nnb\u202fsp",
        "caf\u00e9 composed vs cafe\u0301 decomposed",
        "bad decode \ufffd\ufffd here",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "i long, t string"
    )
    got = {
        r["i"]: (r["c"], r["s"], r["r"])
        for r in df.select(
            "i",
            cl.strip_control_chars(F.col("t")).alias("c"),
            cl.clean_text(F.col("t")).alias("s"),
            cl.replacement_char_ratio(F.col("t")).alias("r"),
        ).collect()
    }
    for i, t in enumerate(rows):
        want_c = re.sub(cl.CONTROL_CHARS_PATTERN, "", t)
        want_s = re.sub(cl.UNICODE_SPACES_PATTERN, " ", want_c)
        want_r = (t.count("�") / len(t)) if t else 0.0
        assert got[i] == (want_c, want_s, want_r), (i, t)
    # the zero-width/space rows actually changed (the patterns bite)
    assert got[2][0] == "zerowidthjoiner bom end"
    assert got[3][1] == "nb sp en quad thin sp ideo space nnb sp"
    assert "\u00a0" not in got[3][1] and "\u3000" not in got[3][1]

    # NFC stage: decomposed é becomes composed é; fingerprints then
    # agree between canonically-equivalent spellings
    out = {
        r["i"]: r["t"]
        for r in cl.normalize_unicode_text(df, text_col="t").collect()
    }
    for i, t in enumerate(rows):
        assert out[i] == unicodedata.normalize("NFC", t)
    assert "café" not in out[4] and "café" in out[4]


def test_unicode_hygiene_is_codegen(spark):
    import contextlib
    import io

    from pyspark.sql import functions as F

    from topn_clashroyal_etl_sql_snapshot_spark.functions import cleaning as cl

    df = spark.createDataFrame([(1, "x")], "i long, t string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.select(
            cl.clean_text(F.col("t")), cl.replacement_char_ratio(F.col("t"))
        ).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetition_stats_matches_python_oracle(spark):
    import collections
    import re as _re

    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (
        repetition_stats,
    )

    docs = [
        (0, "spam line\nspam line\nspam line\nunique one"),
        (1, "all unique lines\nhere there\nare no repeats"),
        (2, "buy now buy now buy now forever"),
        (5, "a a a a"),  # overlapping top bigram: frac capped at 1.0
        (3, ""),
        (4, "single"),
    ]

    def toks(s):
        return [t for t in _re.sub(r"[^a-zA-Z0-9 ]", " ", s).lower().split() if t]

    def oracle(text):
        lines = [ln for ln in text.split("\n") if ln.strip() != ""]
        lc = collections.Counter(lines)
        total, distinct = len(lines), len(lc)
        chars_total = sum(len(ln) for ln in lines)
        chars_dup = sum(len(ln) * n for ln, n in lc.items() if n > 1)
        tk = toks(text)
        bgs = [(a, b) for a, b in zip(tk, tk[1:])]
        bc = collections.Counter(bgs)
        if bc:
            best = max(bc, key=lambda g: (bc[g], " ".join(g)))
            top_chars = bc[best] * (len(best[0]) + len(best[1]))
        else:
            top_chars = 0
        token_chars = sum(len(t) for t in tk)
        return (
            total,
            (total - distinct) / total if total else 0.0,
            chars_dup / chars_total if chars_total else 0.0,
            min(1.0, top_chars / token_chars) if token_chars else 0.0,
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_lines"],
            round(r["dup_line_frac"], 9),
            round(r["dup_line_char_frac"], 9),
            round(r["top_bigram_char_frac"], 9),
        )
        for r in repetition_stats(df).collect()
    }
    for doc_id, text in docs:
        want = oracle(text)
        want = (want[0], round(want[1], 9), round(want[2], 9), round(want[3], 9))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)

    # include_counts: the raw integer numerators/denominators (the
    # driver row's exact aggregation units) match the same oracle
    counts = {
        r["doc_id"]: (
            r["line_chars"], r["dup_line_chars"],
            r["top_bigram_chars"], r["token_chars"],
        )
        for r in repetition_stats(df, include_counts=True).collect()
    }
    for doc_id, text in docs:
        lines = [ln for ln in text.split("\n") if ln.strip() != ""]
        lc = collections.Counter(lines)
        tk = toks(text)
        bc = collections.Counter(zip(tk, tk[1:]))
        if bc:
            best = max(bc, key=lambda g: (bc[g], " ".join(g)))
            top_chars = bc[best] * (len(best[0]) + len(best[1]))
        else:
            top_chars = 0
        want_counts = (
            sum(len(ln) * n for ln, n in lc.items()),
            sum(len(ln) * n for ln, n in lc.items() if n > 1),
            top_chars,
            sum(len(t) for t in tk),
        )
        assert counts[doc_id] == want_counts, (doc_id, counts[doc_id], want_counts)


def test_cleaning_and_repetition_plans_stay_jvm_side(spark):
    import io
    import contextlib

    from pyspark.sql import functions as F

    from topn_clashroyal_etl_sql_snapshot_spark.functions import cleaning as cl
    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (
        repetition_stats,
    )

    df = spark.createDataFrame([(0, "a b\nc d")], "doc_id long, text string")
    for out in (
        df.select(cl.scrub_pii(F.col("text")).alias("s")),
        repetition_stats(df),
    ):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        plan = buf.getvalue()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_scrub_preserves_dates_and_amounts(spark):
    """High-precision phone pattern: ISO/dotted dates and digit-grouped
    amounts must survive the scrub unchanged."""
    from pyspark.sql import functions as F

    from topn_clashroyal_etl_sql_snapshot_spark.functions import cleaning as cl

    keep = [
        "released 2024-01-15 and 2023.12.31",
        "price 10 000 000 and 1 234 567",
        "range 100-200-300 stays? no wait",  # 100-200: mid 200 ok len3, last 300... 
    ]
    # rows that MUST be redacted
    redact = [
        "call 555 123 4567 now",
        "dial +1 555 123-4567 or +49 30 901820",
        "office (020) 7946 0958",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(keep[:2] + redact)], "i long, t string"
    )
    got = {
        r["i"]: r["s"]
        for r in df.select("i", cl.scrub_pii(F.col("t")).alias("s")).collect()
    }
    assert got[0] == keep[0]
    assert got[1] == keep[1]
    for i in (2, 3, 4):
        assert "<PHONE>" in got[i], got[i]


def test_ngram_repetition_stats_matches_python_oracle(spark):
    """Gopher Table-A1 n-gram filters (textstats.ngram_repetition_stats)
    vs a pure-Python twin: top-n occurrence-weighted char fractions and
    the UNION-of-positions duplicated-n-gram coverage, incl. the
    overlap case ('a a a a ...') where naive per-occurrence counting
    would double-count characters."""
    import re

    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (
        ngram_repetition_stats,
    )

    docs = [
        (1, "the cat sat on the mat the cat sat on a hat"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),  # no repeats
        (3, "a a a a a a a a"),  # maximal overlap
        (4, "one two three four five one two three four five one two"),
        (5, None),
        (6, ""),
        (7, "x y " * 30),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def tokens(text):
        return [
            t
            for t in re.sub(r"[^a-zA-Z0-9 ]", " ", text or "").lower().split()
            if t
        ]

    def py_stats(text, top_ns=(2, 3, 4), dup_ns=(5, 6, 7, 8, 9, 10)):
        toks = tokens(text)
        total = sum(len(t) for t in toks)
        out = {"token_chars": total}
        for n in top_ns:
            grams = {}
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                grams[g] = grams.get(g, 0) + 1
            if not grams or total == 0:
                out[f"top_{n}gram_char_frac"] = 0.0
            else:
                # max by (count, gram) — ties toward the LARGER gram
                # string, mirroring max_by's struct ordering
                best = max(grams.items(), key=lambda kv: (kv[1], kv[0]))
                chars = best[1] * (len(best[0]) - (n - 1))
                out[f"top_{n}gram_char_frac"] = min(1.0, chars / total)
        for n in dup_ns:
            grams = {}
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                grams.setdefault(g, []).append(i)
            covered = set()
            for g, positions in grams.items():
                if len(positions) > 1:
                    for p in positions:
                        covered.update(range(p, p + n))
            chars = sum(len(toks[p]) for p in covered)
            out[f"dup_{n}gram_char_frac"] = (
                chars / total if total > 0 else 0.0
            )
        return out

    got = {r["doc_id"]: r.asDict() for r in ngram_repetition_stats(df).collect()}
    assert set(got) == {d[0] for d in docs}
    for doc_id, text in docs:
        expect = py_stats(text)
        row = got[doc_id]
        assert row["token_chars"] == expect["token_chars"], doc_id
        for key, val in expect.items():
            if key == "token_chars":
                continue
            assert abs(row[key] - val) < 1e-12, (doc_id, key, row[key], val)
    # the overlap doc: every position covered by dup 5-grams → frac 1.0
    assert got[3]["dup_5gram_char_frac"] == 1.0
    # no-repeat doc: all dup fracs zero
    assert all(got[2][f"dup_{n}gram_char_frac"] == 0.0 for n in (5, 6, 7))


def test_ngram_repetition_plan_no_python(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (
        ngram_repetition_stats,
    )

    df = spark.createDataFrame([(1, "a b c a b c a b")], "doc_id long, text string")
    plan = (
        ngram_repetition_stats(df, top_ns=(2,), dup_ns=(5,))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_gopher_quality_gates_decisions_and_reasons(spark):
    """Gopher Table-A1 gate verdicts: each constructed doc fails
    exactly its intended gate(s), the reasons column names them, and
    the clean doc passes everything."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (
        gopher_quality_gates,
    )

    good = (
        "the quick brown fox jumps over a lazy dog while rain falls on "
        "green hills and children play near the old stone bridge in "
        "warm summer light as birds circle high above the quiet valley "
    ) * 2
    docs = [
        (1, good),
        (2, "short text only"),  # word_count (too few)
        (3, "a b c d e f g h i j " * 10 + "the of"),  # mean_word_length low
        (4, " ".join(["supercalifragilisticexpialidocious"] * 60) + " the of"),  # mean_word_length high
        (5, good + " " + "# " * 40),  # symbol_word_ratio
        (6, "\n".join(["- bullet item the of and is"] * 20)),  # bullet_lines
        (7, "\n".join([f"line {i} trails off the of..." for i in range(20)])),  # ellipsis_lines
        (8, good + " " + "12345 " * 120),  # alpha_words
        (9, " ".join(["zormak" if i % 2 else "plinth" for i in range(80)])),  # stopwords
        (10, None),  # NULL → word_count
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["keep"], list(r["reasons"]))
        for r in gopher_quality_gates(df).collect()
    }
    assert got[1] == (True, [])
    assert got[2][0] is False and "word_count" in got[2][1]
    assert got[3][0] is False and "mean_word_length" in got[3][1]
    assert got[4][0] is False and "mean_word_length" in got[4][1]
    assert got[5][0] is False and "symbol_word_ratio" in got[5][1]
    assert got[6][0] is False and "bullet_lines" in got[6][1]
    assert got[7][0] is False and "ellipsis_lines" in got[7][1]
    assert got[8][0] is False and "alpha_words" in got[8][1]
    assert got[9][0] is False and "stopwords" in got[9][1]
    assert got[10] == (False, ["stopwords", "word_count"]) or (
        got[10][0] is False and "word_count" in got[10][1]
    )


def test_gopher_gates_match_python_twin(spark):
    """The verdict equals an independent Python recomputation of every
    threshold on mixed real-ish documents."""
    import re

    from topn_clashroyal_etl_sql_snapshot_spark.functions.text import (
        EN_STOPWORDS,
    )
    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (
        gopher_quality_gates,
    )

    import random

    rng = random.Random(5)
    vocab = (
        "the of and to in data spark table window query join filter "
        "sort merge batch stream value part group order line"
    ).split()
    docs = []
    for i in range(30):
        n = rng.randrange(5, 300)
        words = [rng.choice(vocab) for _ in range(n)]
        if i % 5 == 0:
            words += ["###"] * rng.randrange(0, 30)
        docs.append((i, " ".join(words)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["keep"])
        for r in gopher_quality_gates(df).collect()
    }

    def py_verdict(text):
        words = [w for w in re.split(r"\s+", text) if w]
        n = len(words)
        lines = [l.strip() for l in text.split("\n") if l.strip()]
        toks = [
            t
            for t in re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split()
            if t
        ]
        mean_wlen = sum(len(w) for w in words) / n if n else 0.0
        n_sym = len(re.findall(r"#|\.\.\.|…", text))
        checks = [
            50 <= n <= 100_000,
            3.0 <= mean_wlen <= 10.0,
            (n_sym / n if n else 0.0) <= 0.1,
            (sum(bool(re.match(r"^[-*•▪◦]", l)) for l in lines) / len(lines) if lines else 0.0) <= 0.9,
            (sum(bool(re.search(r"(\.\.\.|…)$", l)) for l in lines) / len(lines) if lines else 0.0) <= 0.3,
            (sum(bool(re.search("[A-Za-z]", w)) for w in words) / n if n else 0.0) >= 0.8,
            len(set(toks) & set(EN_STOPWORDS)) >= 2,
        ]
        return n, all(checks)

    for i, text in docs:
        assert got[i] == py_verdict(text), i


def test_gopher_gates_plan_is_scan_stage_only(spark):
    from topn_clashroyal_etl_sql_snapshot_spark.operators.textstats import (
        gopher_quality_gates,
    )

    df = spark.createDataFrame([(1, "a b the of c")], "doc_id long, text string")
    plan = (
        gopher_quality_gates(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
