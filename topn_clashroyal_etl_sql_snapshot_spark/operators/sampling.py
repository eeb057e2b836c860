"""Deterministic sampling, splitting, and per-group capping for
training-data pipelines.

The reference has no sampling surface (it snapshots everything —
scripts/etl_snapshot_topn.py is a full TRUNCATE+RELOAD); these are the
operations a 100 TB corpus needs before training: carve train/val/test,
downsample a stratum, cap any one group's (domain's, dedup-cluster's)
contribution.

Everything here is keyed on ``xxhash64`` of a stable key column, never
on ``rand()``:

- **Deterministic & replayable**: the same key lands in the same split
  on every run, every cluster size, every Spark version — so eval sets
  stay disjoint from training data across pipeline re-runs.
- **Append-stable**: when the corpus grows, previously sampled keys keep
  their assignment (consistent hashing); a ``rand()`` sample reshuffles
  membership on every recompute.
- **Zero shuffle**: split/sample are narrow projections evaluated inside
  the scan's codegen stage — at 100 TB they cost a column expression,
  not an exchange. Only ``per_group_cap`` shuffles (one exchange on the
  group key), and it is itself the skew mitigator: a pathological group
  contributes at most ``k`` rows downstream.

Verification: Spark's xxhash64 is not re-computable by a SQL oracle
(DuckDB's ``hash()`` differs), so tests/test_sampling.py checks these
against the pure-Python xxHash64 twin (testing/xxh64.py) row-for-row,
and ``per_group_cap`` against a DuckDB ``row_number()`` oracle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 10_000


def bucket_expr(
    key: str | Column, seed: int = 42, buckets: int = DEFAULT_BUCKETS
) -> Column:
    """``pmod(xxhash64(seed_long, key), buckets)`` — a uniform,
    deterministic bucket in [0, buckets). The seed is cast to LongType
    explicitly so the hash input is width-stable (a bare Python-int
    literal would flip between IntegerType and LongType at 2³¹ and
    silently change every bucket)."""
    key_col = F.col(key) if isinstance(key, str) else key
    h = F.xxhash64(F.lit(int(seed)).cast("long"), key_col)
    return F.pmod(h, F.lit(int(buckets)))


def _cumulative_thresholds(
    weights: Mapping[str, float], buckets: int
) -> list[tuple[str, int]]:
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    out: list[tuple[str, int]] = []
    acc = 0.0
    prev = 0
    for name, w in weights.items():
        if w < 0:
            raise ValueError(f"negative split weight for {name!r}")
        acc += w / total
        thr = int(round(acc * buckets))
        if w > 0 and thr <= prev:
            # a positive-weight split rounding to ZERO buckets would be
            # a permanently empty val/test set with no warning — the
            # same sub-resolution condition mixture_sample raises for
            # (r11 review finding)
            raise ValueError(
                f"split {name!r} (weight {w}) rounds to zero buckets at "
                f"resolution 1/{buckets} — raise `buckets` or the weight"
            )
        out.append((name, thr))
        prev = thr
    # float rounding must not orphan the top bucket: pin the last
    # threshold to the full range so labels are exhaustive.
    out[-1] = (out[-1][0], buckets)
    return out


def with_split(
    df: DataFrame,
    key: str | Column,
    weights: Mapping[str, float] | None = None,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Adds ``split_col`` ∈ weights.keys() with proportions ≈ weights
    (exact at bucket granularity: a weight of 0.05 with the default
    10 000 buckets is 500 buckets). Dict order fixes the bucket→label
    layout, so the same (weights, seed) always yields the same splits.

    Rows with a NULL key hash as an empty contribution (Spark's null
    rule leaves the running hash at the seed) — they all land in ONE
    deterministic bucket rather than being dropped; filter beforehand if
    NULL keys should be excluded."""
    # `is not None`, not truthiness: an explicitly-passed empty dict is
    # a misconfiguration that must surface as the sum-check error, not
    # silently become the default 98/1/1 (r11 review finding)
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    b = bucket_expr(key, seed, buckets)
    expr: Column | None = None
    for name, threshold in _cumulative_thresholds(weights, buckets):
        expr = (
            F.when(b < threshold, F.lit(name))
            if expr is None
            else expr.when(b < threshold, F.lit(name))
        )
    return df.withColumn(split_col, expr)


def split_by_component(
    docs: DataFrame,
    labels: DataFrame,
    weights: Mapping[str, float] | None = None,
    id_col: str = "doc_id",
    label_id_col: str = "id",
    comp_col: str = "comp",
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
    split_col: str = "split",
) -> DataFrame:
    """Leakage-safe deterministic splits: bucket on the near-dup
    COMPONENT label instead of the document key, so every member of a
    duplicate cluster lands in the SAME split. A plain per-document
    hash split puts ~(1 - Σwᵢ²) of each near-dup cluster's pairs
    across split boundaries — train/val leakage that inflates eval
    exactly on the most duplicated (hence most memorizable) content;
    splitting on the component key eliminates it by construction
    while keeping :func:`with_split`'s replay-determinism (same
    (weights, seed) → same assignment, before or after corpus
    growth, as long as component labels are stable — which
    ``connected_components``' min-id labels are under appends that
    don't bridge clusters).

    ``labels`` is a ``connected_components`` result ((id, comp) —
    only documents that belong to some pair appear); documents absent
    from it are singletons and bucket on their own id, which equals
    the component label they would have carried. Join cost is honest
    about duplicate share (r11 measurement, tools/scale_split_r11.py):
    on CURATED corpora the labels frame is a few % of the corpus, AQE
    broadcasts it, and the corpus never shuffles; on raw WEB CRAWLS
    30-50% of documents sit in some near-dup cluster, labels are
    corpus-order and over any broadcast bound, and the plan degrades
    to a key-partitioned shuffle join — scale-SAFE (two id-keyed
    exchanges, measured near-flat wall at 10× rows with a 50% planted
    share) but the corpus DOES shuffle once in that regime.

    Compose AFTER dedup when training drops duplicates anyway (the
    keeper inherits the component's split); compose INSTEAD of dedup
    when duplicates are deliberately retained (upsampling) and must
    still stay on one side of the eval fence."""
    lab = labels.select(
        F.col(label_id_col).alias(id_col), F.col(comp_col).alias("_comp")
    )
    joined = docs.join(lab, id_col, "left")
    key = F.coalesce(F.col("_comp"), F.col(id_col))
    return with_split(joined, key, weights, seed, buckets, split_col).drop(
        "_comp"
    )


def hash_sample(
    df: DataFrame,
    key: str | Column,
    fraction: float,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Keep ≈``fraction`` of rows by key-bucket: membership is a pure
    function of (key, seed), so re-runs, retries, and corpus growth
    never change which keys are in-sample. All keys sharing a bucket
    move together — sample by a GROUPING key (doc id, user id) to keep
    groups intact, which is exactly the leakage-safety property a
    random-per-row sample cannot give."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    thr = int(round(fraction * buckets))
    if fraction > 0 and thr < 1:
        # a positive fraction that rounds to zero buckets silently
        # keeps NOTHING — the condition mixture_sample already raises
        # for (r11 review finding; fraction=0.0 stays a legitimate
        # explicit keep-nothing)
        raise ValueError(
            f"fraction {fraction} is below bucket resolution "
            f"(1/{buckets}) and would keep zero rows — raise `buckets`"
        )
    return df.filter(bucket_expr(key, seed, buckets) < thr)


def target_bucket_threshold(
    total_rows: int, target_rows: int, buckets: int = DEFAULT_BUCKETS
) -> int:
    """The bucket threshold that keeps ≈``target_rows`` of
    ``total_rows``: ``min(buckets, target·buckets // total)`` — pure
    INTEGER floor arithmetic, so a SQL oracle computing the same
    expression from ``COUNT(*)`` lands on the identical threshold
    (``round()`` would put Python's half-even against SQL's half-away
    at .5 boundaries). ``total_rows ≤ target_rows`` keeps everything;
    the floor is clamped to ≥ 1 so a corpus larger than
    ``target·buckets`` over-keeps (≈ total/buckets rows) rather than
    silently keeping NOTHING — callers needing resolution at that
    scale must grow ``buckets`` (``hash_sample_target`` does)."""
    if target_rows < 0 or total_rows < 0:
        raise ValueError("row counts must be non-negative")
    if target_rows == 0:
        # the ≥1 clamp exists to stop a LARGE corpus flooring a small
        # positive target to nothing; an explicit target of zero must
        # keep zero, not ~total/buckets rows (r11 review finding)
        return 0
    if total_rows <= target_rows:
        return buckets
    return min(buckets, max(1, target_rows * buckets // total_rows))


def hash_sample_target(
    df: DataFrame,
    key: str | Column,
    target_rows: int,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
    total_rows: int | None = None,
) -> DataFrame:
    """Keep ≈``target_rows`` rows regardless of corpus size — the
    production form of the ``hash_sample`` fraction knob: as the corpus
    grows, the implied fraction shrinks so downstream cost stays
    CONSTANT instead of quadratic (the r7 sf0.3 measurement of
    ``embedding_neardup_pairs`` at a FIXED fraction — 3× corpus ⇒ 6.6×
    wall — is exactly the failure mode this closes).

    The bucket space GROWS with the corpus when the default can't
    resolve the implied fraction: at ``total > target·buckets/100``
    the 10⁴-bucket default would floor the threshold under 100 (±1%
    granularity), so buckets scale to keep threshold ≈ 100 — without
    this, a >5M-row corpus at target 500 floors the threshold to the
    clamp and the 'constant size' contract breaks (r7 review finding).

    Costs one ``count()`` job up front (the corpus size is the input
    to the threshold) — unless the caller already holds the size from
    an adjacent aggregation and passes ``total_rows`` (e.g. the PQ fit
    reads it off its width histogram), which makes the sample free of
    extra jobs. Membership stays a pure function of (key, seed,
    buckets, threshold): replayable within a corpus snapshot; across
    corpus GROWTH the threshold (and possibly the bucket space) moves,
    so unlike plain ``hash_sample`` the sample is NOT append-stable —
    pin ``hash_sample`` with an explicit fraction where
    append-stability matters more than bounded cost."""
    total = df.count() if total_rows is None else total_rows
    if target_rows > 0 and total > target_rows * (buckets // 100 or 1):
        # keep ~1% granularity: threshold lands near 100
        buckets = 100 * ((total + target_rows - 1) // target_rows)
    thr = target_bucket_threshold(total, target_rows, buckets)
    return df.filter(bucket_expr(key, seed, buckets) < thr)


def stratified_hash_sample(
    df: DataFrame,
    strata: str | Column,
    fractions: Mapping[str, float],
    key: str | Column,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-stratum deterministic sampling (``sampleBy``'s semantics —
    strata absent from ``fractions`` are dropped — but hash-keyed, so
    it is replayable and append-stable). Rebalances a skewed corpus,
    e.g. downsampling a dominant language or source to a target mix.
    The when-chain stays a narrow projection; strata cardinality is
    assumed small (it is a label set, not a key space)."""
    strata_col = F.col(strata) if isinstance(strata, str) else strata
    b = bucket_expr(key, seed, buckets)
    keep: Column = F.lit(False)
    for value, fraction in fractions.items():
        if not 0.0 <= fraction <= 1.0:
            raise ValueError(f"fraction for stratum {value!r} not in [0, 1]")
        keep = keep | (
            (strata_col == F.lit(value)) & (b < int(round(fraction * buckets)))
        )
    return df.filter(keep)


def _group_weights(
    df: DataFrame, group_col: str, weight_col: str | None
) -> dict:
    """group → total weight (one aggregation + bounded collect — group
    cardinality is a label set). Shared by both mixing entry points so
    the weight definition cannot drift between them."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    rows = (
        df.groupBy(group_col)
        .agg(F.sum(w.cast("double")).alias("_w"))
        .collect()
    )
    # NULL groups are unmixable (no target share can name them) and a
    # None key crashed replicate_by_multiplier's sorted() when
    # mixture_multipliers back-filled every corpus group (r11 review
    # finding) — they drop here, like every unlisted group
    return {
        r[group_col]: r["_w"] or 0.0
        for r in rows
        if r[group_col] is not None
    }


def _normalized_shares(target_shares: Mapping[str, float]) -> dict[str, float]:
    """Validate + normalize a target-share mapping to sum 1 — the ONE
    place share validation lives (mixture_multipliers, and through it
    mixture_fractions/mixture_sample/mixture_resample, plus
    mixture_sample_incremental all delegate here, per the module's
    no-re-derivation discipline)."""
    neg = {g: v for g, v in target_shares.items() if v < 0}
    if neg:
        # a negative share silently inflates the others past 1 and
        # breaks the total-budget contract (r11 review finding)
        raise ValueError(f"negative target shares: {neg}")
    total_s = float(sum(target_shares.values()))
    if total_s <= 0:
        raise ValueError("target shares must sum to a positive value")
    return {g: s / total_s for g, s in target_shares.items()}


def mixture_fractions(
    weights: Mapping[str, float], target_shares: Mapping[str, float]
) -> dict[str, float]:
    """Per-group keep-fractions that move a corpus to a TARGET mixture
    by DOWNSAMPLING ONLY (the Pile/DoReMi-style domain re-weighting,
    without duplication): kept weight of group g becomes ``c·s_g``
    where ``c = min_g W_g/s_g`` — the largest total the target shares
    admit without upsampling any group. Groups absent from
    ``target_shares`` get fraction 0 (dropped); a target group absent
    from the corpus raises (the mixture is unsatisfiable).

    Exactly :func:`mixture_multipliers` at ``anchor="max"`` (where
    every multiplier is ≤ 1 and therefore a fraction) restricted to
    the target groups — DELEGATED, not re-derived, so the two mixing
    paths can never drift apart (review finding; the
    anchor-max ≡ mixture_sample key-set invariant is test-pinned)."""
    mult = mixture_multipliers(weights, target_shares, anchor="max")
    return {g: mult[g] for g in target_shares}


def mixture_sample(
    df: DataFrame,
    group_col: str,
    target_shares: Mapping[str, float],
    key: str | Column = "doc_id",
    weight_col: str | None = None,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Deterministically downsample each group so the kept corpus's
    per-group weight shares ≈ ``target_shares`` — the domain-mixture
    stage of a training pipeline (rebalance crawl/books/code/wiki to a
    recipe) as one aggregation + one stratified hash filter.

    ``weight_col`` (e.g. ``n_tokens``/``n_chars``) weights the mixture
    in that unit; ``None`` weights by document count. Shares land at
    bucket granularity and whole KEYS move together (hash sampling —
    replayable, leakage-safe), so realized shares carry the usual
    per-group sampling noise; exactness improves with group size.
    Groups not named in ``target_shares`` are dropped — name them
    explicitly to keep them."""
    weights = _group_weights(df, group_col, weight_col)
    fracs = mixture_fractions(weights, target_shares)
    # a positive-share group whose fraction floors below one bucket
    # would contribute ZERO rows — a silently-wrong mixture, worse
    # than the error an absent group raises (r7 review finding)
    too_fine = {
        g: f for g, f in fracs.items() if 0 < f and int(round(f * buckets)) < 1
    }
    if too_fine:
        raise ValueError(
            f"mixture fractions below bucket resolution (1/{buckets}) for "
            f"{sorted(too_fine)}: these groups would contribute zero rows. "
            "Raise `buckets`, or rethink a mixture this extreme."
        )
    return stratified_hash_sample(df, group_col, fracs, key, seed, buckets)


def mixture_multipliers(
    weights: Mapping[str, float],
    target_shares: Mapping[str, float],
    anchor: str = "max",
    total: float | None = None,
) -> dict[str, float]:
    """Per-group REPLICATION multipliers that move a corpus to a target
    mixture, allowing UPSAMPLING (the epochs-style domain re-weighting
    of public training recipes — GPT-3/Llama-class data tables repeat
    small high-quality domains >1 epoch while crawl runs <1): group g
    gets ``r_g = c·s_g/W_g``, so kept weight ∝ target share exactly,
    with the free scale ``c`` pinned by ``anchor``:

    - ``"max"``: largest multiplier = 1 — downsample-only (the
      :func:`mixture_fractions` regime, corpus shrinks).
    - ``"min"``: smallest positive multiplier = 1 — no group loses
      data; over-represented groups replicate ≥ 1x (corpus grows).
    - ``total=T``: kept weight sums to T in the weight unit (token
      budget form); anchor is ignored.

    Groups absent from ``target_shares`` get multiplier 0 (dropped); a
    positive-share group with no corpus weight raises (unsatisfiable
    with or without upsampling)."""
    shares = _normalized_shares(target_shares)
    for g, s in shares.items():
        if s > 0 and weights.get(g, 0) <= 0:
            raise ValueError(
                f"target group {g!r} has no corpus weight — the requested "
                "mixture is unsatisfiable"
            )
    ratios = {g: s / weights[g] for g, s in shares.items() if s > 0}
    if total is not None:
        if total <= 0:
            raise ValueError(f"total budget must be positive, got {total}")
        c = total
    elif anchor == "max":
        c = 1.0 / max(ratios.values())
    elif anchor == "min":
        c = 1.0 / min(ratios.values())
    else:
        raise ValueError(f"anchor must be 'max' or 'min', got {anchor!r}")
    out = {g: (c * ratios[g] if s > 0 else 0.0) for g, s in shares.items()}
    for g in weights:
        out.setdefault(g, 0.0)
    return out


def mixture_ledger_fractions(
    hist: Mapping[str, float],
    supply: Mapping[str, float],
    target_shares: Mapping[str, float],
) -> dict[str, float]:
    """The pure water-filling core of :func:`mixture_sample_incremental`
    — per-group keep FRACTIONS of today's supply given immutable
    history: feasible total ``T = min over supplied target groups of
    (hist_g + supply_g)/share_g``, keep ``k_g = clamp(T·s_g − hist_g,
    0, supply_g)``, fraction ``k_g/supply_g``. Returns {} when no
    target group has supply. Extracted so the math is directly
    property-testable (invariants: 0 ≤ f ≤ 1; the binding group keeps
    everything; kept never lifts a group above its entitlement
    ``max(hist, T·s)``; with empty history this is exactly
    :func:`mixture_fractions` over the supplied groups)."""
    shares = _normalized_shares(target_shares)
    caps = [
        (hist.get(g, 0.0) + supply.get(g, 0.0)) / s
        for g, s in shares.items()
        if s > 0 and supply.get(g, 0.0) > 0
    ]
    if not caps:
        return {}
    t_total = min(caps)
    fracs = {}
    for g, s in shares.items():
        b_g = supply.get(g, 0.0)
        if b_g <= 0:
            continue
        k_g = min(max(t_total * s - hist.get(g, 0.0), 0.0), b_g)
        fracs[g] = k_g / b_g
    return fracs


def mixture_sample_incremental(
    batch: DataFrame,
    ledger: DataFrame | None,
    group_col: str,
    target_shares: Mapping[str, float],
    key: str | Column = "doc_id",
    weight_col: str | None = None,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Daily-ingest domain mixing: admit as much of TODAY's batch as
    the target recipe allows, so the RUNNING kept corpus converges to
    ``target_shares`` across days — :func:`mixture_sample` for the
    incremental regime, where yesterday's keeps are immutable (a
    downsample-only gate cannot retroactively remove history, so the
    knob is how much of each domain to admit today).

    ``ledger`` is the persisted per-group accounting of everything
    kept so far — a two-column ``(group_col, kept_w)`` frame (label-set
    cardinality, like every mixing model here; pass ``None`` on day
    0). The gate solves the same water-filling problem as
    :func:`mixture_fractions`, floored by history: the feasible total
    is ``T = min over supplied target groups of (c_g + b_g)/s_g``
    (history + today's supply, fully spent on the binding domain), and
    each group keeps ``k_g = clamp(T·s_g − c_g, 0, b_g)`` — an
    over-represented domain keeps nothing until the others catch up,
    an under-represented one keeps everything offered. With an empty
    ledger the HAPPY PATH is exactly :func:`mixture_sample` — same
    kept key set, test-pinned — but the error contracts deliberately
    differ: the one-shot mixer raises on an unsatisfiable or
    below-bucket-resolution mixture (its only chance to object), while
    this gate admits what it can and rolls the shortfall forward,
    because a daily gate gets another day (see the drift paragraph
    below).

    A target domain with no supply today does not stall the day: the
    min skips it, the running mixture drifts off-target by its missing
    mass, and the formula self-corrects when supply returns (its
    entitlement ``T·s_g − c_g`` accumulates — it keeps everything
    offered until caught up). Likewise a day where some group's keep
    fraction floors below bucket resolution admits zero of it and
    rolls the entitlement forward — documented drift, not an error,
    because unlike the one-shot mixer a daily gate gets another day.
    Unknown groups (absent from ``target_shares``) drop, as in every
    mixing entry point.

    Returns ``(kept, updated_ledger)``: ``kept`` is the admitted batch
    subset (hash-bucket membership within each group — replayable,
    append-stable, whole keys move together); ``updated_ledger`` is the
    ledger plus the ACTUAL kept weight per group (a lazy label-set
    aggregation over the kept frame, so bucket-granularity rounding
    can never silently desynchronize the ledger from the data).
    Persist it for day N+1. Everything driver-side is label-set
    bounded — the batch itself is touched by one weights aggregation
    and one narrow filter. Streaming ingest composes via
    ``foreachBatch`` (the gate needs the batch's per-group supply
    before it can solve for T, so per-micro-batch is its natural
    grain — same pattern as :func:`~.dedup.connected_components_incremental`)."""
    supply = _group_weights(batch, group_col, weight_col)
    hist: dict = {}
    if ledger is not None:
        hist = {
            r[group_col]: float(r["kept_w"] or 0.0) for r in ledger.collect()
        }
    fracs = mixture_ledger_fractions(hist, supply, target_shares)
    if not fracs:
        # nothing admissible today (no target group has supply)
        kept = batch.filter(F.lit(False))
    else:
        kept = stratified_hash_sample(
            batch, group_col, fracs, key, seed, buckets
        )
    w = F.col(weight_col) if weight_col else F.lit(1)
    kept_acc = kept.groupBy(group_col).agg(
        F.sum(w.cast("double")).alias("kept_w")
    )
    merged = (
        kept_acc if ledger is None
        else ledger.select(group_col, "kept_w").unionByName(kept_acc)
    )
    updated_ledger = merged.groupBy(group_col).agg(
        F.sum("kept_w").alias("kept_w")
    )
    return kept, updated_ledger


def replicate_by_multiplier(
    df: DataFrame,
    multipliers: Mapping[str, float],
    group_col: str,
    key: str | Column = "doc_id",
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
    epoch_col: str = "epoch",
    max_multiplier: float = 100.0,
) -> DataFrame:
    """Replicate each group's rows ``r_g`` times IN EXPECTATION,
    deterministically: every row gets ``⌊r⌋`` copies plus one more iff
    its key-bucket falls under ``frac(r)`` — the same xxhash64-bucket
    membership as :func:`hash_sample` (replayable, append-stable,
    whole keys move together), and ``r < 1`` degenerates to exactly
    :func:`stratified_hash_sample`'s keep rule, so ONE operator covers
    both directions of re-weighting. Copies carry ``epoch_col``
    (0..n-1): downstream shuffles (``shuffle_order_expr`` seeded by
    epoch) decorrelate the repeats, and token pipelines can treat each
    epoch as a separate pass.

    Plan shape: a when-chain multiplier lookup + ``explode(sequence)``
    — a narrow projection inside the scan stage, zero shuffle, output
    rows ∝ Σ r_g·n_g. ``max_multiplier`` fuses accidental blowups (a
    tiny group pulled to a large share replicates catastrophically;
    raise the fuse deliberately if a >100x repeat is really wanted —
    public recipes rarely exceed single digits)."""
    groups = sorted(multipliers)
    bad = {g: r for g, r in multipliers.items() if r < 0}
    if bad:
        raise ValueError(f"negative multipliers: {bad}")
    worst = max(multipliers.values(), default=0.0)
    if worst > max_multiplier:
        raise ValueError(
            f"multiplier {worst} exceeds max_multiplier={max_multiplier}: "
            "a replication this large is usually a mis-specified mixture "
            "(tiny group pulled to a huge share). Raise the fuse if meant."
        )
    gcol = F.col(group_col)
    b = bucket_expr(key, seed, buckets)
    n_copies: Column = F.lit(0)
    for g in groups:
        r = float(multipliers[g])
        whole = int(r)
        frac_threshold = int(round((r - whole) * buckets))
        n_copies = F.when(
            gcol == F.lit(g),
            F.lit(whole) + (b < frac_threshold).cast("int"),
        ).otherwise(n_copies)
    return (
        df.withColumn("_nc", n_copies)
        .filter(F.col("_nc") > 0)
        .withColumn(epoch_col, F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)))
        .drop("_nc")
    )


def mixture_resample(
    df: DataFrame,
    group_col: str,
    target_shares: Mapping[str, float],
    key: str | Column = "doc_id",
    weight_col: str | None = None,
    anchor: str = "min",
    total: float | None = None,
    seed: int = 42,
    buckets: int = DEFAULT_BUCKETS,
    epoch_col: str = "epoch",
    max_multiplier: float = 100.0,
) -> DataFrame:
    """The UPSAMPLING-capable sibling of :func:`mixture_sample`: move
    the corpus to ``target_shares`` by replicating under-represented
    groups and hash-thinning over-represented ones, in one aggregation
    + one narrow replicate projection. Default ``anchor="min"`` keeps
    every group's full data (training recipes repeat wiki/books rather
    than discard crawl); ``total`` pins an absolute kept-weight budget
    instead. Output rows carry ``epoch_col`` — dedupe-sensitive stages
    must run BEFORE this operator (the copies are intentional)."""
    weights = _group_weights(df, group_col, weight_col)
    mult = mixture_multipliers(weights, target_shares, anchor, total)
    too_fine = {
        g: r
        for g, r in mult.items()
        if 0 < r and int(r) == 0 and int(round((r % 1) * buckets)) < 1
    }
    if too_fine:
        raise ValueError(
            f"multipliers below bucket resolution (1/{buckets}) for "
            f"{sorted(too_fine)}: these groups would contribute zero rows. "
            "Raise `buckets`, or rethink a mixture this extreme."
        )
    return replicate_by_multiplier(
        df, mult, group_col, key, seed, buckets, epoch_col, max_multiplier
    )


def shuffle_order_expr(
    key: str | Column, seed: int = 42, tiebreak: str | Column | None = None
) -> list[Column]:
    """Sort columns for a deterministic corpus shuffle: ORDER BY
    ``xxhash64(seed, key)`` is a uniform permutation that is a pure
    function of (key, seed) — reproducible across runs and cluster
    sizes, re-dealable by changing the seed (epoch number as seed =
    a fresh permutation per epoch). Training pipelines need this to
    decorrelate document order from crawl/source order without
    `rand()`'s replay instability.

    Returns sort columns (hash, then ``tiebreak`` or the key itself so
    equal non-NULL hashes still order totally). Honesty note (r11
    review): NULL keys all hash alike AND the default tiebreak is the
    key itself — NULL for exactly those rows — so NULL-key rows have
    no deterministic relative order under the defaults; pass a
    non-NULL unique ``tiebreak`` (or filter NULL keys first) where
    that matters. Use as ``df.orderBy(*shuffle_order_expr("doc_id"))``,
    or ``df.repartitionByRange(n, *...)`` to materialize shuffled
    output files without a single global sort partition."""
    key_col = F.col(key) if isinstance(key, str) else key
    tb = key_col if tiebreak is None else (
        F.col(tiebreak) if isinstance(tiebreak, str) else tiebreak
    )
    return [F.xxhash64(F.lit(int(seed)).cast("long"), key_col), tb]


def per_group_quantile_cap(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    keep_frac: float,
) -> DataFrame:
    """Keep the best ``keep_frac`` FRACTION of each group by
    ``order_cols`` — the percentile gate of modern curation recipes
    (FineWeb/DCLM-style: keep the top X% per domain by a quality or
    perplexity score), where :func:`per_group_cap` keeps an absolute
    count. ``ceil`` keeps at least one row from every non-empty group
    (a gate should trim a domain, not erase it). Make the ordering
    total (include a unique tiebreaker) or the cut line is
    nondeterministic.

    Plan: ONE window partitioned by the group key computing rank and
    group size together — one exchange, rank-only state, and (like
    ``per_group_cap``) the output's group sizes shrink, so this gate
    removes downstream skew rather than creating it."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    wall = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .filter(
            # round at 9 dp before the ceil: n*frac can land an IEEE
            # epsilon ABOVE the exact decimal integer (100*0.07 =
            # 7.000000000000001) and ceil would keep one extra row
            # (r11 review finding); the >=1-per-group guarantee holds
            # since round preserves any value > 0 at this precision
            F.col("_rn")
            <= F.ceil(
                F.round(F.col("_n") * F.lit(float(keep_frac)), 9)
            ).cast("long")
        )
        .drop("_rn", "_n")
    )


def per_group_cap(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[str | Column],
    k: int,
) -> DataFrame:
    """At most ``k`` rows per group, chosen by ``order_cols`` (make the
    ordering total — include a unique tiebreaker — or the cap is
    nondeterministic). The training-pipeline use: cap any one domain /
    near-dup cluster / user at k documents so no group dominates the
    mix. One exchange on the group key; the window is rank-only, so
    map-side nothing accumulates beyond the row buffer, and post-cap
    every group is ≤ k rows — this operator REMOVES downstream skew
    rather than creating it."""
    if k < 1:
        raise ValueError(f"k must be ≥ 1, got {k}")
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
