"""Relational (explode + codegen aggregate) forms of the text analytics.

The column expressions in ``functions/text.py`` are the right shape for
composition, but marker counting via per-row ``F.filter`` lambdas runs
interpreted (see SCALE.md on the HOF hazard). These table-level forms do
one explode and compiled conditional SUMs — the 100 TB shape.

Semantics are identical to the expression forms (same tokenizer, same
marker sets, same tie-break order) — asserted in tests/test_text.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as tx
from ..functions.litarrays import lit_strings


def _safe_div(a, b):
    """a/b as double with the zero-denominator convention both
    repetition operators advertise (0.0, never NULL) — ONE definition
    (r11: it was duplicated in both and could drift)."""
    return F.when(b > 0, a.cast("double") / b).otherwise(F.lit(0.0))


def lang_id_table(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id_col..., predicted_lang) for every input row.

    Plan: one rlike per doc for the CJK gate; explode tokens → 4
    conditional SUMs per doc (partial+final, codegen) → broadcast-size
    join back; argmax with LANG_ORDER tie-break, 'und' when no markers.
    """
    base = docs.withColumn("_cjk", F.col(text_col).rlike("[\\u4e00-\\u9fff]"))

    from .dedup import _spread

    toks = _spread(docs, id_col).select(
        F.col(id_col).alias("_id"),
        F.explode(tx.tokens(F.col(text_col))).alias("tok"),
    )
    counts = toks.groupBy("_id").agg(
        *[
            F.sum(F.col("tok").isin(*markers).cast("long")).alias(f"_c_{lang}")
            for lang, markers in tx.LANG_MARKERS.items()
        ]
    )

    joined = base.join(counts, base[id_col] == counts["_id"], "left").drop("_id")
    cnt = {
        lang: F.coalesce(F.col(f"_c_{lang}"), F.lit(0)) for lang in tx.LANG_MARKERS
    }
    best = F.greatest(*cnt.values())
    pred = F.when(F.col("_cjk"), F.lit("zh")).when(best <= 0, F.lit("und"))
    for lang in tx.LANG_ORDER:
        pred = pred.when(cnt[lang] == best, F.lit(lang))
    pred = pred.otherwise(F.lit("und"))

    return joined.withColumn("predicted_lang", pred).drop(
        "_cjk", *[f"_c_{lang}" for lang in tx.LANG_MARKERS]
    )


def token_stats(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Per-group doc/token/char accounting (single pass, integer sums).

    NULL text contributes 0 to every total (r11 review finding: on
    non-ANSI deployments ``size(NULL)`` is -1, so each NULL-text row
    SUBTRACTED a token from its group while the char sum skipped it —
    and an all-NULL group summed to NULL rather than 0)."""
    return (
        docs.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col(text_col).isNotNull(),
                        tx.token_count(F.col(text_col)),
                    ).otherwise(F.lit(0))
                ),
                F.lit(0),
            ).alias("total_tokens"),
            F.coalesce(
                F.sum(F.coalesce(F.length(text_col), F.lit(0))), F.lit(0)
            ).alias("total_chars"),
        )
        .orderBy(group_col)
    )


def winnow_marked(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, h, wmin) — every token k-gram's md5 with its sliding-
    window minimum. Each row's ``wmin`` IS the selected fingerprint of
    the window ending at that position, so the document's selected SET
    is the DISTINCT ``wmin`` values — NOT the rows where ``h == wmin``
    (r11 review finding, simulation-confirmed: the h==wmin rule only
    selects a k-gram when it is the minimum of the one window ending
    at its own position, and missed the shared fingerprint on 37% of
    document pairs overlapping by exactly window+k-1 tokens — the
    guarantee boundary). The shared stage behind
    :func:`winnow_fingerprints` (per-doc density rollup) and
    ``operators/overlap.py`` (cross-document repeated-substring
    detection). One shuffle on the doc id serves the k-gram leads, the
    sliding window, and downstream per-doc grouping."""
    from pyspark.sql import Window as W

    from .dedup import _spread

    toks = _spread(docs, id_col).select(
        F.col(id_col).alias("id"),
        F.posexplode(tx.tokens(F.col(text_col))).alias("pos", "tok"),
    )
    w_doc = W.partitionBy("id").orderBy("pos")
    leads = [F.col("tok")] + [F.lead("tok", j).over(w_doc) for j in range(1, k)]
    grams = (
        toks.select(
            "id",
            "pos",
            F.md5(F.concat_ws(" ", *leads)).alias("h"),
            leads[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("id", "pos", "h")
    )
    w_slide = W.partitionBy("id").orderBy("pos").rowsBetween(-(window - 1), 0)
    return grams.withColumn("wmin", F.min("h").over(w_slide))


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS scheme): hash every token k-gram IN ORDER, slide a window
    of ``window`` consecutive hashes, select each window's minimum —
    the guarantee is ≥1 selected fingerprint per window, so any match
    of ``window + k - 1`` consecutive tokens between two documents
    shares a fingerprint. Winnowing's expected selected-POSITION
    density is 2/(window+1); ``n_fingerprints`` counts DISTINCT
    selected hashes, which is what overlap joins consume (repeats of
    one boilerplate k-gram collapse).

    Variant notes (deterministic, cross-engine): the k-gram hash is the
    md5 HEX STRING and the window minimum is lexicographic — string
    comparison behaves identically in Spark and any SQL oracle, whereas
    engine-specific 64-bit hashes (xxhash64) cannot be re-computed by
    DuckDB. The trailing window includes the partial windows at the
    head of the document (simpler than MOSS's full-windows-only rule;
    strictly more fingerprints, same guarantee).

    Returns (doc_id, n_kgrams, n_fingerprints, density) — the corpus
    fingerprint-density profile. Plan: one explode + two window passes
    over (doc, pos) + one aggregate; all codegen, shuffles once on doc
    id (reused by both windows and the aggregate).
    """
    marked = winnow_marked(docs, k, window, text_col, id_col)
    prof = marked.groupBy(F.col("id").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_kgrams"),
        # the selected set is the DISTINCT window minima (see
        # winnow_marked — the old h==wmin rule broke the guarantee)
        F.countDistinct("wmin").alias("n_fingerprints"),
    )
    # row-per-input contract like the sibling operators: docs with
    # fewer than k tokens (or NULL text) produce no k-grams and used
    # to vanish from the profile (r11 review finding)
    return (
        docs.select(F.col(id_col))
        .join(prof, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_kgrams", F.lit(0)).alias("n_kgrams"),
            F.coalesce("n_fingerprints", F.lit(0)).alias("n_fingerprints"),
        )
        .withColumn(
            "density",
            F.when(
                F.col("n_kgrams") > 0,
                F.col("n_fingerprints").cast("double") / F.col("n_kgrams"),
            ).otherwise(F.lit(0.0)),
        )
    )


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    include_counts: bool = False,
) -> DataFrame:
    """Gopher-style within-document repetition signals, the quality
    gates that catch boilerplate/templated/spam docs that per-token
    metrics miss:

    - ``dup_line_frac``      — fraction of lines that are repeats of an
      earlier-seen line (1 - distinct/total),
    - ``dup_line_char_frac`` — fraction of line characters belonging to
      duplicated lines (all occurrences counted, as in Gopher),
    - ``top_bigram_char_frac`` — characters of the most frequent word
      bigram's occurrences over total token characters, capped at 1.0
      (overlapping occurrences — 'a a a a' — would otherwise push the
      ratio over 1; the cap keeps it a usable [0,1] gate, matching how
      the Gopher thresholds are applied).

    Plan: two explodes (lines, token bigrams) into (doc, value)
    groupBys with compiled aggregates, joined back on the doc id —
    partial+final hash aggregation, shuffles keyed on the doc id and
    high-cardinality (doc, value) pairs, no HOF-interpreted loops, no
    Python. The per-doc token-character total is aggregated from the
    same posexplode stream the bigrams use (3 scans of the input, not
    4: lines, tokens, and the bare-id base row set for empty docs).
    Empty docs yield zero fractions (no NULL poisoning).

    Reference: Rae et al. 2021 (Gopher), Table A1 repetition filters;
    thresholds are the caller's policy, this op just measures.

    ``include_counts=True`` appends the raw INTEGER numerators and
    denominators (``line_chars``, ``dup_line_chars``,
    ``top_bigram_chars``, ``token_chars``) — exact, order-independent
    aggregation units for corpus-level rollups (a sum of per-doc
    FRACTIONS is neither meaningful nor float-stable; the driver row
    sums these integers instead).
    """
    from pyspark.sql import Window as W

    from .dedup import _spread

    spread = _spread(docs, id_col)

    lines = spread.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).filter(F.trim(F.col("line")) != "")
    per_line = lines.groupBy("_id", "line").agg(
        F.count(F.lit(1)).alias("n"), F.length("line").alias("len")
    )
    line_stats = per_line.groupBy("_id").agg(
        F.sum("n").alias("_lines_total"),
        F.count(F.lit(1)).alias("_lines_distinct"),
        F.sum(F.col("n") * F.col("len")).alias("_line_chars_total"),
        F.sum(
            F.when(F.col("n") > 1, F.col("n") * F.col("len")).otherwise(0)
        ).alias("_line_chars_dup"),
    )

    # One tokenize+explode pass serves BOTH the bigram grouping and the
    # token-character total: lazily checkpointed so the second consumer
    # reads the materialized stream instead of re-tokenizing the corpus.
    bigrams = spread.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tx.tokens(F.col(text_col))).alias("pos", "tok"),
    ).localCheckpoint(eager=False)
    w_doc = W.partitionBy("_id").orderBy("pos")
    nxt = F.lead("tok").over(w_doc)
    per_bigram = (
        bigrams.select(
            "_id",
            F.concat_ws(" ", F.col("tok"), nxt).alias("bg"),
            (F.length("tok") + F.length(nxt)).alias("blen"),
            nxt.alias("_nxt"),
        )
        .filter(F.col("_nxt").isNotNull())
        .groupBy("_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"), F.first("blen").alias("blen"))
    )
    bigram_stats = per_bigram.groupBy("_id").agg(
        F.max_by(F.col("n") * F.col("blen"), F.struct(F.col("n"), F.col("bg"))).alias(
            "_top_bigram_chars"
        ),
    )
    token_chars = bigrams.groupBy("_id").agg(
        F.sum(F.length("tok")).alias("_token_chars")
    )

    out = (
        spread.select(id_col)
        .join(line_stats, spread[id_col] == line_stats["_id"], "left")
        .drop("_id")
        .join(token_chars.withColumnRenamed("_id", id_col), id_col, "left")
        .join(
            bigram_stats.withColumnRenamed("_id", id_col), id_col, "left"
        )
    )
    safe_div = _safe_div
    cols = [
        F.col(id_col),
        F.coalesce(F.col("_lines_total"), F.lit(0)).alias("n_lines"),
        safe_div(
            F.coalesce(F.col("_lines_total") - F.col("_lines_distinct"), F.lit(0)),
            F.coalesce(F.col("_lines_total"), F.lit(0)),
        ).alias("dup_line_frac"),
        safe_div(
            F.coalesce(F.col("_line_chars_dup"), F.lit(0)),
            F.coalesce(F.col("_line_chars_total"), F.lit(0)),
        ).alias("dup_line_char_frac"),
        F.least(
            F.lit(1.0),
            safe_div(
                F.coalesce(F.col("_top_bigram_chars"), F.lit(0)),
                F.coalesce(F.col("_token_chars"), F.lit(0)),
            ),
        ).alias("top_bigram_char_frac"),
    ]
    if include_counts:
        cols += [
            F.coalesce(F.col("_line_chars_total"), F.lit(0)).alias("line_chars"),
            F.coalesce(F.col("_line_chars_dup"), F.lit(0)).alias("dup_line_chars"),
            F.coalesce(F.col("_top_bigram_chars"), F.lit(0)).alias("top_bigram_chars"),
            F.coalesce(F.col("_token_chars"), F.lit(0)).alias("token_chars"),
        ]
    return out.select(*cols)


def ngram_repetition_stats(
    docs: DataFrame,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    text_col: str = "text",
    id_col: str = "doc_id",
    toks: DataFrame | None = None,
) -> DataFrame:
    """The REST of Gopher Table A1's repetition filters
    (:func:`repetition_stats` covers lines + the top bigram; note the
    default ``top_ns`` still includes n=2, so composing both operators
    computes the top-bigram statistic twice under two names —
    ``top_bigram_char_frac`` ≡ ``top_2gram_char_frac`` — which the
    registered text_ngram_repetition row's oracle depends on; pass
    ``top_ns=(3, 4)`` to skip the duplicate work when composing):

    - ``top_{n}gram_char_frac`` (n ∈ ``top_ns``) — characters of ALL
      occurrences of the single most frequent n-gram over total token
      characters (capped at 1.0 — overlapping occurrences can exceed
      the total, same cap rationale as the bigram column);
    - ``dup_{n}gram_char_frac`` (n ∈ ``dup_ns``) — fraction of token
      characters COVERED by any n-gram that occurs more than once in
      the document. Coverage is a UNION of token positions (Gopher's
      definition: overlapping duplicated n-grams must not double-count
      a character), computed relationally as explode-the-span →
      DISTINCT (doc, position) → sum of covered token lengths — no
      interval algebra needed, the distinct IS the union.

    Plan (r17, GROUPED passes): grams come from the shared token-ARRAY
    scan (``dedup.token_arrays``) via slice+join inside a transform
    (arrays are document-sized, so the per-row HOF touches ~100
    elements, not the corpus). The n values run in GROUPS — all
    ``top_ns`` as one (id, n, gram) pass, ``dup_ns`` in chunks of 3 —
    with n riding the gram stream as a small int key and each group's
    per-n outputs pivoted out of one aggregation, so 9 default ns cost
    4 gram passes instead of 9. Duplicated-gram detection is one
    (doc, n, gram) groupBy per group; coverage is one explode +
    distinct + join keyed on the doc id. Every shuffle is doc-keyed or
    (doc, n, gram)-keyed — high cardinality, no skew surface.

    Adjudication history: an r8 attempt fused ALL 9 passes through ONE
    (id, n, gram) aggregation and lost 1.36× (tools/ab_ngram_r9.py —
    wider shuffle rows across all 9 ns beat the saved exchanges); the
    r16 verdict asked for the middle ground and the r17 A/B
    (tools/ab_ngram3_r17.py: interleaved alternating, bit-identical
    asserted at sf0.01) read per-n 3.29 s vs 3-way-grouped 2.13 s
    median at sf0.1 — non-overlapping samples, adopted.

    Empty/NULL docs surface with zero fractions via the final left
    joins (no NULL poisoning). Reference: Rae et al. 2021, Table A1;
    thresholds are the caller's policy."""
    from .dedup import token_arrays

    if toks is None:
        toks = token_arrays(docs, text_col, id_col)
    toks = toks.select(F.col("id"), F.col("toks"))

    # (id, p, len): the 0-based token-position stream with lengths —
    # the coverage unit every dup group joins against.
    tokstream = toks.select(
        "id", F.posexplode("toks").alias("p", "tok")
    ).select("id", "p", F.length("tok").alias("len"))
    totals = tokstream.groupBy("id").agg(
        F.sum("len").alias("_token_chars")
    )

    def grams_of_group(ns: tuple[int, ...]) -> DataFrame:
        # one exploded (id, n, pos, gram) stream for the whole group.
        # sequence(1, 0) DESCENDS in Spark (it never returns empty), so
        # docs shorter than n need an explicit empty-array branch.
        # The per-n lambda comes from a SINGLE-parameter factory — a
        # `lambda i, _n=n` default would be read by F.transform as the
        # two-arg (element, index) form and bind _n to the index.
        def gram_struct(n: int):
            return lambda i: F.struct(
                F.lit(n).alias("n"),
                (i - 1).alias("pos"),
                F.array_join(F.slice(F.col("toks"), i, n), " ").alias("gram"),
            )

        per_n = [
            F.transform(
                F.when(
                    F.size("toks") >= n,
                    F.sequence(F.lit(1), F.size("toks") - (n - 1)),
                ).otherwise(F.array().cast("array<int>")),
                gram_struct(n),
            )
            for n in ns
        ]
        return toks.select(
            "id", F.explode(F.flatten(F.array(*per_n))).alias("g")
        ).select("id", "g.n", "g.pos", "g.gram")

    out = docs.select(F.col(id_col).alias("id"))
    safe_div = _safe_div

    stats_cols: list = []
    if top_ns:
        top = (
            grams_of_group(tuple(top_ns))
            .groupBy("id", "n", "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .groupBy("id", "n")
            .agg(
                F.max_by(
                    F.col("cnt") * (F.length("gram") - (F.col("n") - 1)),
                    F.struct(F.col("cnt"), F.col("gram")),
                ).alias("_top")
            )
            .groupBy("id")
            .agg(
                *[
                    F.sum(F.when(F.col("n") == n, F.col("_top"))).alias(
                        f"_top{n}"
                    )
                    for n in top_ns
                ]
            )
        )
        out = out.join(top, "id", "left")
    for n in top_ns:
        stats_cols.append(
            F.least(
                F.lit(1.0),
                safe_div(
                    F.coalesce(F.col(f"_top{n}"), F.lit(0)),
                    F.coalesce(F.col("_token_chars"), F.lit(0)),
                ),
            ).alias(f"top_{n}gram_char_frac")
        )

    dup_groups = [
        tuple(dup_ns[i : i + 3]) for i in range(0, len(dup_ns), 3)
    ]
    for ns in dup_groups:
        grams = grams_of_group(ns)
        dup_keys = (
            grams.groupBy("id", "n", "gram")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") > 1)
            .select("id", "n", "gram")
        )
        covered = (
            grams.join(dup_keys, ["id", "n", "gram"])
            .select(
                "id",
                "n",
                F.explode(
                    F.sequence(F.col("pos"), F.col("pos") + F.col("n") - 1)
                ).alias("p"),
            )
            .distinct()
            .join(tokstream, ["id", "p"])
            .groupBy("id")
            .agg(
                *[
                    F.sum(F.when(F.col("n") == n, F.col("len"))).alias(
                        f"_dup{n}"
                    )
                    for n in ns
                ]
            )
        )
        out = out.join(covered, "id", "left")
    for n in dup_ns:
        stats_cols.append(
            safe_div(
                F.coalesce(F.col(f"_dup{n}"), F.lit(0)),
                F.coalesce(F.col("_token_chars"), F.lit(0)),
            ).alias(f"dup_{n}gram_char_frac")
        )

    return out.join(totals, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("_token_chars"), F.lit(0)).alias("token_chars"),
        *stats_cols,
    )


def gopher_quality_gates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    max_bullet_line_frac: float = 0.9,
    max_ellipsis_line_frac: float = 0.3,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher Table-A1 QUALITY gate as one decision function
    (Rae et al. 2021; the same rule set FineWeb/Dolma re-use): word
    count in [50, 100k], mean word length in [3, 10], `#`/`…` symbols
    per word ≤ 0.1, ≤ 90% of lines bullet-started, ≤ 30% of lines
    ellipsis-ended, ≥ 80% of words containing a letter, and ≥ 2 hits
    from a required-stopword list. Defaults are the paper's published
    thresholds; every one is a keyword for policy tuning.

    Returns (id_col, n_words, keep, reasons): ``keep`` is the AND of
    all gates, ``reasons`` the sorted array of failed gate names —
    curation pipelines log WHY a document died (reject-reason
    telemetry drives threshold tuning), so the reasons column is the
    product, not a debug extra.

    Plan: ONE projection computes every signal from three compiled
    token/line splits (raw-whitespace words for the length stats —
    Gopher counts words before any normalization — plus raw lines,
    plus normalized tokens for the stopword probe); no explode, no
    join, no shuffle: the gate runs inside the scan stage and composes
    with ``streaming/corpus.py`` unchanged (stateless).
    NULL text fails the word-count gate (n_words = 0), surfacing as
    keep = false with that reason — never a NULL verdict."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.array_remove(F.split(t, r"\s+"), "")
    lines = F.array_remove(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)), ""
    )
    # STAGED projections: materialize each array ONCE, then reduce —
    # expressing every signal directly off the text would re-split it
    # per reference (Spark's subexpression elimination doesn't reach
    # into the interpreted HOF lambdas; measured ~2x on the registered
    # row), and the arrays referenced below would each re-compute.
    staged = docs.select(
        F.col(id_col),
        t.alias("_t"),
        words.alias("_w"),
        lines.alias("_l"),
        tx.tokens(t).alias("_k"),
    ).select(
        id_col,
        F.size("_w").alias("_nw"),
        F.aggregate(
            "_w", F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("_wchars"),
        # OCCURRENCES, not characters: '...' is one symbol hit (the
        # chars-removed shortcut would count it as 3 and triple-weight
        # ellipses against the ratio)
        F.regexp_count(F.col("_t"), F.lit(r"#|\.\.\.|…")).alias("_nsym"),
        F.size("_l").alias("_nl"),
        F.size(
            F.filter(F.col("_l"), lambda l: l.rlike(r"^([-*•▪◦])"))
        ).alias("_bl"),
        F.size(
            F.filter(F.col("_l"), lambda l: l.rlike(r"(\.\.\.|…)$"))
        ).alias("_el"),
        F.size(
            F.filter(F.col("_w"), lambda w: w.rlike("[A-Za-z]"))
        ).alias("_aw"),
        F.size(
            F.array_intersect(F.col("_k"), lit_strings(tx.EN_STOPWORDS))
        ).alias("_sh"),
    )
    n_words = F.col("_nw")
    mean_wlen = F.when(
        n_words > 0, F.col("_wchars").cast("double") / n_words
    ).otherwise(F.lit(0.0))
    n_symbols = F.col("_nsym")
    n_lines = F.col("_nl")
    bullet_lines = F.col("_bl")
    ellipsis_lines = F.col("_el")
    alpha_words = F.col("_aw")
    stop_hits = F.col("_sh")

    checks = [
        ("word_count", (n_words >= min_words) & (n_words <= max_words)),
        (
            "mean_word_length",
            (mean_wlen >= min_mean_word_len) & (mean_wlen <= max_mean_word_len),
        ),
        (
            "symbol_word_ratio",
            F.when(n_words > 0, n_symbols.cast("double") / n_words).otherwise(
                F.lit(0.0)
            )
            <= max_symbol_word_ratio,
        ),
        (
            "bullet_lines",
            F.when(
                n_lines > 0, bullet_lines.cast("double") / n_lines
            ).otherwise(F.lit(0.0))
            <= max_bullet_line_frac,
        ),
        (
            "ellipsis_lines",
            F.when(
                n_lines > 0, ellipsis_lines.cast("double") / n_lines
            ).otherwise(F.lit(0.0))
            <= max_ellipsis_line_frac,
        ),
        (
            "alpha_words",
            F.when(
                n_words > 0, alpha_words.cast("double") / n_words
            ).otherwise(F.lit(0.0))
            >= min_alpha_word_frac,
        ),
        ("stopwords", stop_hits >= min_stopword_hits),
    ]
    reasons = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(~cond, F.lit(name)).otherwise(F.lit(None))
                    for name, cond in checks
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    keep = checks[0][1]
    for _, cond in checks[1:]:
        keep = keep & cond
    return staged.select(
        F.col(id_col),
        n_words.alias("n_words"),
        keep.alias("keep"),
        reasons.alias("reasons"),
    )
