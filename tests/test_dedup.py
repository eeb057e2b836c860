"""Dedup operator tests: exact, trigram Jaccard, MinHash-LSH, SimHash.

Ground truth is a brute-force Python Jaccard over the same tokenization;
MinHash/SimHash are validated against it (recall on planted near-dups,
estimate accuracy bounds) since their hash outputs are engine-specific.
"""

from __future__ import annotations

import itertools
import random
import re

import pytest
from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import dedup

WORDS = (
    "spark table hash join scan filter sort merge shuffle batch stream key value "
    "row column agg window query plan stage task part order line"
).split()


def _tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"[^a-zA-Z0-9 ]", " ", text).lower().split() if t]


def _trigrams(text: str) -> set[str]:
    toks = _tokens(text)
    return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def corpus(spark):
    rng = random.Random(7)
    docs = []
    base_texts = []
    for i in range(30):
        text = " ".join(rng.choice(WORDS) for _ in range(60))
        base_texts.append(text)
        docs.append((i, text))
    # exact duplicates of docs 0 and 1
    docs.append((100, base_texts[0]))
    docs.append((101, base_texts[1]))
    # near-duplicates: change 3 of 60 words of docs 2..4
    for j, src in enumerate((2, 3, 4)):
        toks = base_texts[src].split()
        for pos in (5, 25, 45):
            toks[pos] = "changed%d" % pos
        docs.append((200 + j, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    truth = {
        (min(i, j), max(i, j)): _jaccard(_trigrams(t1), _trigrams(t2))
        for (i, t1), (j, t2) in itertools.combinations(docs, 2)
    }
    return df, dict(docs), truth


def test_exact_dedup(spark, corpus):
    df, docs, _ = corpus
    groups = dedup.exact_dup_groups(df).collect()
    got = {(g["copies"], g["keep_id"]) for g in groups}
    assert got == {(2, 0), (2, 1)}

    kept = dedup.dedup_exact(df)
    assert kept.count() == len(docs) - 2
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert 0 in kept_ids and 100 not in kept_ids


def test_exact_family_null_text_exemption(spark):
    """NULL text has a NULL fingerprint and is EXEMPT across the whole
    exact family: dedup_exact keeps every NULL row (they are not dups
    of each other), exact_dup_groups reports no NULL group, and both
    incremental gates admit every NULL row without touching the
    index/bitmap (the r10 advisor's silent-drop finding: the
    NULL-rejecting inner/anti joins used to swallow them)."""
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    assert sorted(
        r["doc_id"] for r in dedup.dedup_exact(df).collect()
    ) == [1, 3, 4]
    assert dedup.exact_dup_groups(df).count() == 1  # only the text group

    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx

    index = spark.createDataFrame(
        [("same text",)], "text string"
    ).select(tx.content_fingerprint(F.col("text")).alias("fingerprint"))
    adm, idx = dedup.dedup_exact_incremental(df, index)
    assert sorted(r["doc_id"] for r in adm.collect()) == [3, 4]
    assert all(r["fingerprint"] is not None for r in idx.collect())

    bitmap = dedup.bloom_bitmap(index, m_bits=1 << 16)
    adm_b, idx_b, bmp_b = dedup.dedup_exact_incremental_bloom(
        df, index, bitmap, m_bits=1 << 16
    )
    assert sorted(r["doc_id"] for r in adm_b.collect()) == [3, 4]
    assert all(r["fingerprint"] is not None for r in idx_b.collect())


def test_jaccard_pairs_match_bruteforce(spark, corpus):
    df, _, truth = corpus
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.jaccard_pairs(df, threshold=0.3).collect()
    }
    want = {p: j for p, j in truth.items() if j >= 0.3}
    assert set(got) == set(want)
    for p in want:
        assert abs(got[p] - want[p]) < 1e-12


def test_minhash_lsh_finds_planted_pairs(spark, corpus):
    df, _, truth = corpus
    pairs = {
        (r["id1"], r["id2"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(df, threshold=0.35).collect()
    }
    # every planted pair (exact j ≥ 0.6) must be recalled
    planted = {p for p, j in truth.items() if j >= 0.6}
    assert planted <= set(pairs), f"missed: {planted - set(pairs)}"
    # estimates near truth for recalled pairs (k=128 → σ ≈ 0.044)
    for p, est in pairs.items():
        assert abs(est - truth[p]) < 0.2, (p, est, truth[p])
    # exact duplicates estimate ≈ 1.0
    assert pairs[(0, 100)] == 1.0
    assert pairs[(1, 101)] == 1.0


def test_verified_pair_plans_equal_exact(spark, corpus):
    """The two candidate-generation strategies (MinHash-LSH, SimHash
    pigeonhole) post-verified by true Jaccard must reproduce the exact
    inverted-index result whenever candidate recall is full."""
    df, _, truth = corpus
    want = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.jaccard_pairs(df, threshold=0.5).collect()
    }
    for fn in (dedup.minhash_lsh_verified_pairs, dedup.simhash_verified_pairs):
        got = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in fn(df, threshold=0.5).collect()
        }
        assert got == want, (fn.__name__, set(got) ^ set(want))


def test_simhash_candidates(spark, corpus):
    df, _, truth = corpus
    fps = dedup.simhash_fingerprints(df)
    # exact duplicates: identical fingerprints → hamming 0
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in dedup.simhash_candidate_pairs(fps, max_hamming=16).collect()
    }
    assert got.get((0, 100)) == 0
    assert got.get((1, 101)) == 0
    # near-dups (3/60 words changed) land within small hamming distance
    for pair in ((2, 200), (3, 201), (4, 202)):
        assert pair in got and got[pair] <= 16, (pair, got.get(pair))
    # unrelated docs do not appear at small hamming radii
    small = {p for p, h in got.items() if h <= 3}
    unrelated = {p for p in small if truth.get(p, 0.0) < 0.3}
    assert not unrelated, unrelated


def test_banding_overflow_guard(spark):
    """bands*rows_per_band > k used to hash every doc into one constant
    bucket per overflowing band — a planted n² self-join uncapped, or
    silently dead bands capped (r11 review finding). All three entry
    points that know k must refuse the layout up front."""
    docs = spark.createDataFrame(
        [(i, f"text {i} words here") for i in range(4)],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(docs, k=32)
    with pytest.raises(ValueError, match="exceeds k"):
        dedup.minhash_lsh_pairs(docs, k=32)  # default 32x4 > 32
    with pytest.raises(ValueError, match="exceeds k"):
        dedup.minhash_lsh_verified_pairs(docs, k=32)
    with pytest.raises(ValueError, match="exceeds k"):
        dedup.minhash_lsh_incremental(docs, sigs, k=32)
    # a fitting layout passes
    dedup.minhash_lsh_pairs(docs, k=32, bands=8, rows_per_band=4).collect()


def test_component_keepers_string_ids(spark):
    """Keeper selection must be id-type agnostic (web doc ids are
    URLs/hashes): the rank key uses no id arithmetic, so string ids
    order naturally — best score wins, exact ties fall to the LOWER
    string, all-unscored components fall to min id (r11 review
    finding: the old -id tie-break lane raised under ANSI on
    strings)."""
    labels = spark.createDataFrame(
        [("url-b", "url-a"), ("url-a", "url-a"), ("url-z", "url-x"),
         ("url-x", "url-x")],
        "id string, comp string",
    )
    scores = spark.createDataFrame(
        [("url-a", 1.0), ("url-b", 5.0)], "id string, score double"
    )
    keep = {
        r["id"]: r["keep"]
        for r in dedup.component_keepers(labels, scores).collect()
    }
    # scored component: url-b's 5.0 beats url-a's 1.0
    assert keep == {"url-b": True, "url-a": False,
                    "url-x": True, "url-z": False}
    # exact-tie component falls to the lexicographically lower id
    tied = spark.createDataFrame(
        [("url-q", 2.0), ("url-p", 2.0)], "id string, score double"
    )
    lab2 = spark.createDataFrame(
        [("url-q", "url-p"), ("url-p", "url-p")], "id string, comp string"
    )
    keep2 = {
        r["id"]: r["keep"]
        for r in dedup.component_keepers(lab2, tied).collect()
    }
    assert keep2 == {"url-p": True, "url-q": False}


def test_excise_token_spans_overlapping_spans(spark):
    """Overlapping spans must not fan tokens out or double-count: a
    token covered by two spans drops once (the covered-position
    distinct), counts stay per-token exact."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(1, 1, 4), (1, 3, 6), (1, 6, 6)],  # overlap at 3; empty span
        "doc_id long, span_start long, span_end long",
    )
    out = dedup.excise_token_spans(docs, spans).collect()[0]
    assert out["clean_text"] == "a g h"
    assert out["n_tokens_kept"] == 3 and out["n_tokens_dropped"] == 5


def test_connected_components_chain_and_isolated(spark):
    """Chain a-b-c collapses to one component under min-label
    propagation (takes 2 rounds: c learns a's label through b); an
    isolated pair keeps its own min; keep = id == component."""
    pairs = spark.createDataFrame(
        [(5, 9), (9, 12), (20, 21)], "id1 long, id2 long"
    )
    comp = {
        r["id"]: r["comp"] for r in dedup.connected_components(pairs).collect()
    }
    assert comp == {5: 5, 9: 5, 12: 5, 20: 20, 21: 20}


def test_connected_components_raises_on_nonconvergence(spark):
    """A chain far longer than the geometric coverage of max_iter
    rounds can't finish even with pointer jumping (with the deferred
    default the covered label distance is ~2 after the plain prefix,
    roughly doubling per jump round); returning the partial labels
    would be a silently-wrong KEEP/DROP decision, so the operator must
    raise instead. small_collect=None pins the DISTRIBUTED loop — the
    r16 driver fast path solves a 40-edge chain exactly and never
    engages the fuse (that exactness is pinned separately by the
    fast-vs-loop differential)."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id1 long, id2 long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(chain, max_iter=3, small_collect=None)
    # the same chain converges fine with a logarithmic round budget
    comp = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(
            chain, max_iter=10, small_collect=None
        ).collect()
    }
    assert comp == {i: 0 for i in range(41)}


def test_connected_components_chain_converges_in_log_rounds(spark):
    """The pointer-jumping scale pin: a 400-node path component —
    the templated-pages-with-counters shape where each adjacent
    revision is a near-dup of the next but the ends are unrelated —
    resolves within a LOGARITHMIC round budget (12 rounds: a 2-round
    plain prefix, then the covered distance roughly doubles per jump
    round), where plain min-label propagation would need ~399 rounds
    and trip any sane fuse. Labels must still be exactly the component
    minimum, and jump_start=0 (always-jump) must agree.
    small_collect=None: this pins the DISTRIBUTED loop's round
    budget, so the r16 driver fast path must stay out of the way."""
    n = 400
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id1 long, id2 long"
    )
    comp = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(
            chain, max_iter=12, small_collect=None
        ).collect()
    }
    assert comp == {i: 0 for i in range(n + 1)}
    comp0 = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(
            chain, max_iter=12, jump_start=0, small_collect=None
        ).collect()
    }
    assert comp0 == comp


def test_observation_resolves_after_eager_checkpoint(spark):
    """Version canary (r15 advisor finding): the fused-counter design
    — connected_components' convergence sum and every ingest report
    counter — rides ``df.observe`` metrics delivered by
    ``localCheckpoint(eager=True)``'s withAction path, and
    ``Observation.get`` has NO timeout: if a Spark upgrade ever stops
    firing observed metrics for the checkpoint action, the failure
    mode is a silently hung ingest day, not an error. This pins the
    contract with a bounded wait so the upgrade surfaces as a fast
    red test instead. Verified working on the pinned PySpark 4.1.2."""
    import queue
    import threading

    from pyspark.sql import Observation

    obs = Observation()
    df = (
        spark.range(1000)
        .observe(obs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    q: queue.Queue = queue.Queue()
    t = threading.Thread(target=lambda: q.put(obs.get["n"]), daemon=True)
    t.start()
    try:
        n = q.get(timeout=60)
    except queue.Empty:
        pytest.fail(
            "Observation.get did not resolve within 60s of an eager "
            "localCheckpoint — the fused-counter contract (observed "
            "metrics fire on the checkpoint's withAction) broke; "
            "every dedup/ingest counter site would hang"
        )
    assert n == 1000
    assert df.count() == 1000


def test_connected_components_fast_path_matches_loop(spark):
    """The r16 small-relation fast path (driver union-find over one
    bounded collect) must produce BIT-IDENTICAL labels to the
    distributed min-label loop — randomized differential over mixed
    graph shapes (self-loops, duplicate edges, chains, stars,
    singletons), plus schema equality so downstream joins see the
    same column types either way."""
    import random

    rng = random.Random(1234)
    for _ in range(4):
        n_nodes = rng.choice([1, 7, 60, 300])
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes))
            for _ in range(rng.randint(0, 2 * n_nodes))
        ]
        edges += [(i, i + 1) for i in range(0, min(20, n_nodes - 1))]
        df = spark.createDataFrame(
            edges or [(0, 0)], "id1 long, id2 long"
        )
        fast = dedup.connected_components(df, n_pairs=df.count())
        loop = dedup.connected_components(df, small_collect=None)
        assert fast.schema == loop.schema
        assert sorted(map(tuple, fast.collect())) == sorted(
            map(tuple, loop.collect())
        )


def test_connected_components_fast_path_null_and_type_fallbacks(spark):
    """Null endpoints and mixed endpoint types take the distributed
    path's semantics — the fast path must defer, not approximate."""
    withnull = spark.createDataFrame(
        [(1, 2), (None, 3)], "id1 long, id2 long"
    )
    fast = sorted(
        map(
            tuple,
            dedup.connected_components(withnull, n_pairs=2).collect(),
        ),
        key=repr,
    )
    loop = sorted(
        map(
            tuple,
            dedup.connected_components(
                withnull, small_collect=None
            ).collect(),
        ),
        key=repr,
    )
    assert fast == loop
    mixed = spark.createDataFrame(
        [(1, 2), (2, 3)], "id1 int, id2 long"
    )
    fastm = dedup.connected_components(mixed, n_pairs=2)
    loopm = dedup.connected_components(mixed, small_collect=None)
    assert fastm.schema == loopm.schema
    assert sorted(map(tuple, fastm.collect())) == sorted(
        map(tuple, loopm.collect())
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_connected_components_randomized_vs_union_find(spark, seed):
    """The pointer-jumping rework must agree with a dependency-free
    union-find on arbitrary graph shapes — random sparse edges over
    120 nodes (mixes tight clusters, chains, and isolated pairs),
    labels compared as exact partition-with-min-label maps."""
    rng = random.Random(seed)
    nodes = list(range(120))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(90)
    ]
    edges = [(a, b) for a, b in edges if a != b]

    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {a for a, _ in edges} | {b for _, b in edges}
    want = {n: find(n) for n in sorted(touched)}
    # canonical label = min member id per component
    comp_min: dict[int, int] = {}
    for n, r in want.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in touched}

    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(df, max_iter=15).collect()
    }
    assert got == want


def test_connected_components_incremental_basics(spark):
    """Daily-ingest component merge: new pairs can bridge two old
    components (all members relabel to the global min), a NEW id
    smaller than an old label becomes the merged label, singleton
    endpoints enter the frame, untouched components are byte-stable,
    and re-feeding the same batch is a no-op (self-loop contraction)."""
    hist = spark.createDataFrame(
        [(1, 2), (10, 11), (100, 101)], "id1 long, id2 long"
    )
    labels = dedup.connected_components(hist)

    new = spark.createDataFrame(
        [(2, 10), (0, 11), (50, 60)], "id1 long, id2 long"
    )
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components_incremental(labels, new).collect()
    }
    assert got == {
        # comps {1,2} and {10,11} bridged via (2,10), then new id 0
        # (smaller than every old label) pulls the merged min to 0
        0: 0, 1: 0, 2: 0, 10: 0, 11: 0,
        100: 100, 101: 100,            # untouched component
        50: 50, 60: 50,                # two singleton endpoints
    }
    # ≡ the full run over history ∪ batch
    full = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(hist.unionAll(new)).collect()
    }
    assert got == full

    # idempotent re-feed: same batch against the UPDATED labels
    updated = dedup.connected_components_incremental(labels, new)
    again = {
        r["id"]: r["comp"]
        for r in dedup.connected_components_incremental(updated, new).collect()
    }
    assert again == got


@pytest.mark.parametrize("seed", [3, 4, 5, 6])
def test_connected_components_incremental_matches_full_run(spark, seed):
    """Randomized differential: labels = CC(history edges), then a
    batch of new edges over a MIX of old and brand-new ids — the
    incremental merge must equal both the full Spark rerun over
    history ∪ batch and a dependency-free union-find twin, as exact
    partition-with-min-label maps over the union's node set."""
    rng = random.Random(seed)
    hist_edges = [
        (rng.randrange(80), rng.randrange(80)) for _ in range(50)
    ]
    hist_edges = [(a, b) for a, b in hist_edges if a != b]
    new_edges = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(40)
    ]
    new_edges = [(a, b) for a, b in new_edges if a != b]

    hdf = spark.createDataFrame(hist_edges, "id1 long, id2 long")
    ndf = spark.createDataFrame(new_edges, "id1 long, id2 long")
    labels = dedup.connected_components(hdf)
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components_incremental(labels, ndf).collect()
    }

    # union-find twin over history ∪ batch
    touched = {x for e in hist_edges + new_edges for x in e}
    parent = {n: n for n in touched}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in hist_edges + new_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict[int, int] = {}
    for n in touched:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    want = {n: comp_min[find(n)] for n in touched}
    assert got == want

    full = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(hdf.unionAll(ndf)).collect()
    }
    assert got == full


def test_connected_components_incremental_fuse_and_plan(spark, tmp_path):
    """The batch-size fuse trips before any broadcast is built, and
    the happy-path plan contains ONLY broadcast joins — the persisted
    labels frame (read back from parquet like a real day-N run) is
    never sort-merge/shuffle-hash joined, the incremental family's
    no-index-shuffle contract."""
    hist = spark.createDataFrame(
        [(i, i + 1000) for i in range(200)], "id1 long, id2 long"
    )
    lab_path = str(tmp_path / "labels")
    dedup.connected_components(hist).write.parquet(lab_path)
    labels = spark.read.parquet(lab_path)

    big = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "id1 long, id2 long"
    )
    with pytest.raises(ValueError, match="max_batch_pairs"):
        dedup.connected_components_incremental(labels, big, max_batch_pairs=5)

    out = dedup.connected_components_incremental(labels, big)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_simhash_bucket_cap_drops_hot_buckets(spark):
    """max_bucket is the fingerprint-space max_df analog: a (chunk,
    value) bucket holding more docs than the cap contributes no
    candidates. 40 identical fingerprints share every chunk → capping
    below 40 removes all their pairs; uncapped they all pair up."""
    fps = spark.createDataFrame(
        [(i, 0x0F0F0F0F0F0F0F0F) for i in range(40)], "id long, sh64 long"
    )
    uncapped = dedup.simhash_candidate_pairs(
        fps, max_hamming=7, chunks=8, max_bucket=None
    ).count()
    assert uncapped == 40 * 39 // 2
    capped = dedup.simhash_candidate_pairs(
        fps, max_hamming=7, chunks=8, max_bucket=39
    ).count()
    assert capped == 0


def test_lsh_bucket_cap_drops_hot_buckets(spark):
    """The signature-space twin of the simhash cap: a planted cluster
    of 60 identical signatures collides in EVERY band (one 60-doc
    bucket per band → O(b·c²) join rows uncapped); capping at 50 drops
    those buckets while a 2-doc cold cluster's pair survives. Capped
    candidate volume is bounded at Σ_cold min(bucket, cap)² — here
    exactly the one cold pair."""
    k, bands, rpb = 16, 4, 4
    hot = [(i, [7] * k) for i in range(60)]
    cold = [(100, [9] * k), (101, [9] * k)]
    sigs = spark.createDataFrame(hot + cold, "id long, sig array<long>")
    uncapped = dedup.lsh_candidate_pairs(sigs, bands, rpb, max_bucket=None)
    assert uncapped.count() == 60 * 59 // 2 + 1
    capped = {
        (r["id1"], r["id2"])
        for r in dedup.lsh_candidate_pairs(
            sigs, bands, rpb, max_bucket=50
        ).collect()
    }
    assert capped == {(100, 101)}


def test_minhash_lsh_incremental_cap_matches_capped_full_run(spark):
    """The incremental cap counts (band, bucket) over batch ∪ index —
    the SAME populations a capped full-corpus run sees — so the
    subset invariant holds cap-for-cap: a 12-copy flood split across
    index (8) and batch (4) exceeds cap 6 and contributes no pairs on
    either path, while a genuine batch-vs-index near-dup pair
    survives on both."""
    flood = "repeated boilerplate navigation footer text appears on every page"
    uniq = "the quick brown fox jumps over the lazy dog near the river bank"
    corpus = [(i, flood) for i in range(8)] + [(50, uniq)]
    batch = [(100 + i, flood) for i in range(4)] + [(150, uniq + " today")]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    full = spark.createDataFrame(corpus + batch, "doc_id long, text string")

    index = dedup.minhash_signatures(cdf)
    pairs, _ = dedup.minhash_lsh_incremental(
        bdf, index, threshold=0.4, max_bucket=6
    )
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert got == {(150, 50)}, got  # flood pairs capped away, real pair kept

    # cap-for-cap equivalence with the full-corpus run's new-doc subset
    ref_all = {
        (r["id1"], r["id2"])
        for r in dedup.minhash_lsh_pairs(
            full, threshold=0.4, max_bucket=6
        ).collect()
    }
    new_ids = {100, 101, 102, 103, 150}
    ref = set()
    for a, b in ref_all:
        if a in new_ids and b not in new_ids:
            ref.add((a, b))
        elif b in new_ids and a not in new_ids:
            ref.add((b, a))
        elif a in new_ids and b in new_ids:
            ref.add((min(a, b), max(a, b)))
    assert got == ref
    # and with the cap lifted the flood pairs flow on both paths alike
    unc, _ = dedup.minhash_lsh_incremental(
        bdf, index, threshold=0.4, max_bucket=None
    )
    assert unc.count() == 4 * 8 + 4 * 3 // 2 + 1  # cross + within + real pair


def test_minhash_lsh_hash_math_matches_xxh64_twin(spark, corpus):
    """Re-derive the entire MinHash→LSH candidate path in pure Python via
    the xxHash64 twin (testing/xxh64.py): hashed shingle postings,
    signature min-hashes, band buckets, and the resulting candidate-pair
    set must all match Spark exactly. This closes the docstring's
    'hash outputs are engine-specific' verification gap — the hash math
    itself now has an engine-independent oracle, not just the
    true-Jaccard post-check on the final output."""
    from topn_clashroyal_etl_sql_snapshot_spark.testing.xxh64 import spark_xxhash64

    df, texts, _ = corpus
    k, bands, rpb = 16, 4, 4  # k small enough for the pure-Python side

    # 1. hashed postings: sh64 = xxhash64(shingle_string)
    postings = dedup.hashed_postings(df)
    got_postings: dict[int, set[int]] = {}
    for r in postings.collect():
        got_postings.setdefault(r["id"], set()).add(r["sh"])
    want_postings = {
        i: {spark_xxhash64([("string", sh)]) for sh in _trigrams(t)}
        for i, t in texts.items()
    }
    assert got_postings == want_postings

    # 2. signatures: sig[i] = min over postings of xxhash64(int i, long sh)
    sigs = dedup.minhash_signatures(k=k, postings=postings)
    got_sigs = {r["id"]: list(r["sig"]) for r in sigs.collect()}
    want_sigs = {
        d: [
            min(spark_xxhash64([("int", i), ("long", sh)]) for sh in shs)
            for i in range(k)
        ]
        for d, shs in want_postings.items()
    }
    assert got_sigs == want_sigs

    # 3. band buckets → candidate pairs: bucket = xxhash64(int band,
    #    ",".join(str(sig_slice))); pairs share (band, bucket)
    got_pairs = {
        (r["id1"], r["id2"])
        for r in dedup.lsh_candidate_pairs(sigs, bands, rpb).collect()
    }
    buckets: dict[tuple[int, int], set[int]] = {}
    for d, sig in want_sigs.items():
        for b in range(bands):
            key = spark_xxhash64(
                [
                    ("int", b),
                    ("string", ",".join(str(v) for v in sig[b * rpb : (b + 1) * rpb])),
                ]
            )
            buckets.setdefault((b, key), set()).add(d)
    want_pairs = {
        (a, c)
        for members in buckets.values()
        for a, c in itertools.combinations(sorted(members), 2)
    }
    assert got_pairs == want_pairs
    # the fixture's exact dups must be among the candidates
    assert {(0, 100), (1, 101)} <= got_pairs


def test_simhash_chunks_for_scales_with_corpus():
    from topn_clashroyal_etl_sql_snapshot_spark.operators.dedup import (
        simhash_chunks_for,
    )

    # small corpus: any split is cold -> max chunks, widest radius
    assert simhash_chunks_for(100) == 64
    # 5k docs at target 256 -> width >= 5 -> 12 chunks (radius 11)
    assert simhash_chunks_for(5_000, 256) == 12
    # 1M docs -> width >= 12 -> 5 chunks (radius 4)
    assert simhash_chunks_for(1_000_000, 256) == 5
    # 1B docs -> width >= 22 -> 2 chunks (floor)
    assert simhash_chunks_for(10**9, 256) == 2
    # a required radius floors the chunk count even when buckets go hot
    assert simhash_chunks_for(10**9, 256, min_hamming=7) == 8


def test_dedup_lines_corpus_matches_python_twin(spark):
    """C4-style corpus-level line dedup vs a pure-Python twin: first
    occurrence (min doc_id, line_idx) of every dedupable line survives,
    later occurrences vanish corpus-wide, short lines are exempt, NULL
    text keeps NULL output."""
    from topn_clashroyal_etl_sql_snapshot_spark.operators.dedup import (
        dedup_lines_corpus,
    )

    boiler = "subscribe to our newsletter for the latest updates"
    rows = [
        (1, f"unique opening line of document one\n{boiler}\nmore original text here"),
        (2, f"{boiler}\nanother document entirely with its own words"),
        (3, f"short\n{boiler}\nshort"),          # short lines exempt (kept twice)
        (4, None),
        (5, ""),
        (6, f"more original text here\nfresh content in document six"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    min_chars = 10
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in dedup_lines_corpus(df, min_line_chars=min_chars).collect()
    }

    # python twin
    seen: dict[str, tuple] = {}
    for i, t in rows:
        if t is None:
            continue
        for j, line in enumerate(t.replace("\r\n", "\n").split("\n")):
            if len(line.strip()) >= min_chars and line not in seen:
                seen[line] = (i, j)
    want = {}
    for i, t in rows:
        if t is None:
            want[i] = (None, 0, 0)
            continue
        kept = []
        dropped = 0
        for j, line in enumerate(t.replace("\r\n", "\n").split("\n")):
            if len(line.strip()) < min_chars or seen.get(line) == (i, j):
                kept.append(line)
            else:
                dropped += 1
        want[i] = ("\n".join(kept), len(kept), dropped)
    assert got == want
    # the boilerplate line survived exactly once, in doc 1
    assert boiler in got[1][0] and boiler not in got[2][0] and boiler not in got[3][0]
    # doc 3's short lines both kept
    assert got[3][0].count("short") == 2
    # doc 6 lost its copy of doc 1's line
    assert "more original text here" not in got[6][0]
    assert "fresh content" in got[6][0]


def test_dedup_lines_incremental_matches_full_corpus_run(spark):
    """The line family's daily-ingest invariant, randomized: cleaning
    a batch against the index built from an established corpus must
    equal the batch-doc subset of dedup_lines_corpus over corpus ∪
    batch (monotone ids), for every output column; the updated index
    is exactly the full run's kept-line key set; a same-batch re-feed
    drops every dedupable batch line (all keys now indexed). NULL
    text, empty text, and short-line exemption ride along."""
    rng = random.Random(23)
    pool = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 7)))
        for _ in range(40)
    ]

    def mk_doc():
        n = rng.randint(1, 6)
        return "\n".join(
            rng.choice(pool) if rng.random() < 0.6 else f"u{rng.random()}"
            for _ in range(n)
        )

    corpus_rows = [(i, mk_doc()) for i in range(30)]
    batch_rows = [(100 + i, mk_doc()) for i in range(20)] + [
        (150, None),
        (151, ""),
        (152, "short\n" + pool[0] + "\nshort"),
    ]
    cdf = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bdf = spark.createDataFrame(batch_rows, "doc_id long, text string")

    # day-0 index: keys of the lines the corpus run actually kept —
    # equivalently, all distinct dedupable line keys of the corpus
    corpus_lines = cdf.select(
        F.posexplode(
            F.split(F.regexp_replace("text", "\r\n", "\n"), "\n")
        ).alias("idx", "line")
    ).filter(F.length(F.trim("line")) >= 10)
    index = (
        corpus_lines.select(
            F.xxhash64("line").alias("h"),
            F.xxhash64(F.lit(1).cast("long"), F.col("line")).alias("h2"),
        )
        .distinct()
    )

    cleaned, updated = dedup.dedup_lines_incremental(bdf, index)
    got = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in cleaned.collect()
    }

    full = dedup.dedup_lines_corpus(
        cdf.unionAll(bdf).orderBy("doc_id")
    )
    want = {
        r["doc_id"]: (r["clean_text"], r["n_lines_kept"], r["n_lines_dropped"])
        for r in full.collect()
        if r["doc_id"] >= 100
    }
    assert got == want

    # updated index ≡ the full run's kept-key set (index ∪ new firsts)
    all_lines = cdf.unionAll(bdf).select(
        F.posexplode(
            F.split(F.regexp_replace("text", "\r\n", "\n"), "\n")
        ).alias("idx", "line")
    ).filter(F.length(F.trim("line")) >= 10)
    want_keys = sorted(
        (r["h"], r["h2"])
        for r in all_lines.select(
            F.xxhash64("line").alias("h"),
            F.xxhash64(F.lit(1).cast("long"), F.col("line")).alias("h2"),
        )
        .distinct()
        .collect()
    )
    assert sorted((r["h"], r["h2"]) for r in updated.collect()) == want_keys

    # idempotence: re-feeding the batch against the updated index
    # keeps only short/unique-exempt lines, drops every indexed one
    again, _ = dedup.dedup_lines_incremental(bdf, updated)
    got2 = {r["doc_id"]: r["clean_text"] for r in again.collect()}
    assert got2[150] is None            # NULL text stays NULL
    assert got2[151] == ""              # empty text stays empty
    assert got2[152] == "short\nshort"  # exempt lines kept, pool line gone
    # every dedupable line of the re-fed batch is now a duplicate
    tot = again.agg(
        F.sum("n_lines_kept").alias("k"), F.sum("n_lines_dropped").alias("d")
    ).collect()[0]
    dedupable_total = (
        bdf.select(
            F.posexplode(
                F.split(F.regexp_replace("text", "\r\n", "\n"), "\n")
            ).alias("idx", "line")
        )
        .filter(F.length(F.trim("line")) >= 10)
        .count()
    )
    assert tot["d"] == dedupable_total


@pytest.mark.parametrize("m_bits", [64, 1 << 20])
def test_dedup_lines_incremental_bloom_identity(spark, m_bits):
    """The bloom-prefiltered line gate returns EXACTLY the plain
    gate's cleaned rows and updated index — at m_bits=64 the filter
    saturates and the exact hits join carries correctness alone; the
    updated bitmap equals a fresh build over the updated index's
    composite (h, h2) keys."""
    rng = random.Random(31)
    pool = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(3, 7)))
        for _ in range(25)
    ]

    def mk_doc():
        return "\n".join(
            rng.choice(pool) if rng.random() < 0.6 else f"u{rng.random()}"
            for _ in range(rng.randint(1, 5))
        )

    cdf = spark.createDataFrame(
        [(i, mk_doc()) for i in range(20)], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [(100 + i, mk_doc()) for i in range(15)] + [(150, None)],
        "doc_id long, text string",
    )
    index = (
        cdf.select(
            F.posexplode(
                F.split(F.regexp_replace("text", "\r\n", "\n"), "\n")
            ).alias("idx", "line")
        )
        .filter(F.length(F.trim("line")) >= 10)
        .select(
            F.xxhash64("line").alias("h"),
            F.xxhash64(F.lit(1).cast("long"), F.col("line")).alias("h2"),
        )
        .distinct()
    )
    bitmap = dedup.bloom_bitmap(index, m_bits=m_bits, fp_col=("h", "h2"))

    plain_c, plain_i = dedup.dedup_lines_incremental(bdf, index)
    got_c, got_i, got_b = dedup.dedup_lines_incremental_bloom(
        bdf, index, bitmap, m_bits=m_bits
    )
    assert sorted(map(tuple, got_c.collect())) == sorted(
        map(tuple, plain_c.collect())
    )
    assert sorted(map(tuple, got_i.collect())) == sorted(
        map(tuple, plain_i.collect())
    )
    want_b = {
        r["word"]: r["bits"]
        for r in dedup.bloom_bitmap(
            got_i, m_bits=m_bits, fp_col=("h", "h2")
        ).collect()
    }
    assert {r["word"]: r["bits"] for r in got_b.collect()} == want_b

    # composite-key probe twin: bits match a Python xxh64 over the
    # (seed, h, h2) lanes — pinning that multi-column keys hash all
    # components (a NULL-skipping merge of partial keys would differ)
    from topn_clashroyal_etl_sql_snapshot_spark.testing.xxh64 import (
        spark_xxhash64,
    )

    keys = [(r["h"], r["h2"]) for r in index.collect()]
    words: dict[int, int] = {}
    for h, h2 in keys:
        for i in range(5):
            pos = spark_xxhash64(
                [("long", i), ("long", h), ("long", h2)]
            ) % m_bits
            words[pos >> 6] = words.get(pos >> 6, 0) | (1 << (pos & 63))
    want_raw = {
        w: (b - (1 << 64) if b >= (1 << 63) else b) for w, b in words.items()
    }
    got_raw = {
        r["word"]: r["bits"]
        for r in dedup.bloom_bitmap(
            index, m_bits=m_bits, fp_col=("h", "h2")
        ).collect()
    }
    assert got_raw == want_raw


def test_component_keepers_quality_policy(spark):
    """Quality-aware KEEP: best score wins its component, exact ties
    break toward the lower id, unscored members lose to any scored
    one, an all-unscored component falls back to min-id, singletons
    keep themselves. DuckDB re-derives the identical decision."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1),   # scored component, clear winner 2
         (10, 10), (11, 10),       # exact tie -> lower id 10
         (20, 20), (21, 20),       # 21 unscored, 20 scored -> 20
         (30, 30), (31, 30),       # all unscored -> min id 30
         (40, 40)],                # singleton
        "id long, comp long",
    )
    scores = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.5),
         (10, 0.7), (11, 0.7),
         (20, 0.1),
         (40, 0.0)],
        "id long, score double",
    )
    out = {
        r["id"]: (r["comp"], r["keep"])
        for r in dedup.component_keepers(labels, scores).collect()
    }
    assert out == {
        1: (1, False), 2: (1, True), 3: (1, False),
        10: (10, True), 11: (10, False),
        20: (20, True), 21: (20, False),
        30: (30, True), 31: (30, False),
        40: (40, True),
    }
    # exactly one keeper per component, always
    per_comp = {}
    for _id, (comp, keep) in out.items():
        per_comp[comp] = per_comp.get(comp, 0) + int(keep)
    assert all(v == 1 for v in per_comp.values())

    # lower-is-better polarity (perplexity): component 1's winner flips
    # to id 1 (0.2 is now best)
    low = {
        r["id"]: r["keep"]
        for r in dedup.component_keepers(
            labels, scores, higher_is_better=False
        ).collect()
    }
    assert low[1] and not low[2] and not low[3]
    # unscored members still lose, all-unscored still min-id
    assert low[20] and not low[21] and low[30] and not low[31]

    # independent DuckDB twin of the full decision (NULL-safe rank)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE labels AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {c})" for i, c in
                    [(1,1),(2,1),(3,1),(10,10),(11,10),(20,20),(21,20),
                     (30,30),(31,30),(40,40)])
        + ") t(id, comp)"
    )
    con.execute(
        "CREATE TABLE scores AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {s})" for i, s in
                    [(1,0.2),(2,0.9),(3,0.5),(10,0.7),(11,0.7),(20,0.1),(40,0.0)])
        + ") t(id, score)"
    )
    duck = {
        (r[0]): (r[1], bool(r[2]))
        for r in con.execute("""
            WITH s AS (
              SELECT l.id, l.comp, sc.score
              FROM labels l LEFT JOIN scores sc USING (id)
            ),
            champ AS (
              SELECT comp, id AS keep_id FROM (
                SELECT comp, id,
                       ROW_NUMBER() OVER (
                         PARTITION BY comp
                         ORDER BY (score IS NOT NULL) DESC,
                                  COALESCE(score, 0) DESC, id ASC
                       ) AS rn
                FROM s
              ) WHERE rn = 1
            )
            SELECT s.id, s.comp, s.id = c.keep_id
            FROM s JOIN champ c USING (comp)
        """).fetchall()
    }
    assert duck == out


def test_component_keepers_plan_two_exchanges_no_python(spark):
    """The keep decision is one comp-keyed aggregation + one comp-keyed
    join back — no window sort, no Python nodes; at corpus scale both
    shuffles are linear and key on the component id."""
    labels = spark.range(100).select(
        F.col("id"), (F.col("id") % 10).alias("comp")
    )
    scores = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("score")
    )
    plan = (
        dedup.component_keepers(labels, scores)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" not in plan


def test_minhash_lsh_incremental_matches_full_corpus_plan(spark):
    """The incremental batch-vs-index path must produce EXACTLY the
    new-doc-involving subset of the full-corpus minhash_lsh_pairs run
    (signatures are deterministic, both legs estimate from signature
    agreement) — plus the updated index must equal signatures of the
    full corpus."""
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    corpus = [
        (1, base),
        (2, base + " extra"),                      # near-dup of 1
        (3, "completely different words about spark dataframe shuffles and joins"),
        (4, "another unrelated document concerning parquet column pruning"),
    ]
    batch = [
        (101, base + " indeed"),                   # near-dup of 1/2 (vs index)
        (102, "fresh unique content about watermark semantics in streaming"),
        (103, "fresh unique content about watermark semantics in streams"),  # near-dup of 102 (within batch)
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    full = spark.createDataFrame(corpus + batch, "doc_id long, text string")

    index = dedup.minhash_signatures(cdf)
    pairs, updated = dedup.minhash_lsh_incremental(
        bdf, index, threshold=0.4
    )
    got = {
        (r["id1"], r["id2"]): round(r["est_jaccard"], 9)
        for r in pairs.collect()
    }
    # full-corpus reference, restricted to pairs touching the batch
    ref_all = {
        (r["id1"], r["id2"]): round(r["est_jaccard"], 9)
        for r in dedup.minhash_lsh_pairs(full, threshold=0.4).collect()
    }
    new_ids = {101, 102, 103}
    ref = {}
    for (a, b), j in ref_all.items():
        if a in new_ids or b in new_ids:
            # incremental orients batch-vs-index pairs as (new, old)
            if a in new_ids and b not in new_ids:
                ref[(a, b)] = j
            elif b in new_ids and a not in new_ids:
                ref[(b, a)] = j
            else:
                ref[(min(a, b), max(a, b))] = j
    assert got == ref and got, got
    # the expected structure actually showed up
    assert any(a == 101 and b in (1, 2) for a, b in got)
    assert (102, 103) in got

    # updated index ≡ signatures of the full corpus
    up = {r["id"]: list(r["sig"]) for r in updated.collect()}
    fu = {r["id"]: list(r["sig"]) for r in dedup.minhash_signatures(full).collect()}
    assert up == fu


def test_minhash_sig_expr_parity_both_modes(spark, corpus):
    """The stateless per-row signature expression must equal the batch
    aggregation BIT-FOR-BIT in both shingle modes, and NULL out docs
    with < n tokens (their batch-frame exclusion)."""
    df, _, _ = corpus
    k = 16
    # hashed mode ≡ the production verified-pairs path
    postings = dedup.hashed_postings(df)
    want_h = {
        r["id"]: list(r["sig"])
        for r in dedup.minhash_signatures(k=k, postings=postings).collect()
    }
    got_h = {
        r["doc_id"]: (list(r["sig"]) if r["sig"] is not None else None)
        for r in df.select(
            "doc_id", dedup.minhash_sig_expr(F.col("text"), k=k).alias("sig")
        ).collect()
    }
    assert {i: s for i, s in got_h.items() if s is not None} == want_h

    # string mode ≡ the minhash_signatures(docs) default
    want_s = {
        r["id"]: list(r["sig"])
        for r in dedup.minhash_signatures(df, k=k).collect()
    }
    got_s = {
        r["doc_id"]: (list(r["sig"]) if r["sig"] is not None else None)
        for r in df.select(
            "doc_id",
            dedup.minhash_sig_expr(F.col("text"), k=k, hashed=False).alias("sig"),
        ).collect()
    }
    assert {i: s for i, s in got_s.items() if s is not None} == want_s

    # short/NULL docs yield NULL
    short = spark.createDataFrame(
        [(1, "two words"), (2, None), (3, "")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["sig"]
        for r in short.select(
            "doc_id", dedup.minhash_sig_expr(F.col("text")).alias("sig")
        ).collect()
    }
    assert got == {1: None, 2: None, 3: None}


def test_lsh_buckets_expr_matches_banded(spark, corpus):
    """The per-row band-key expression equals _banded's exploded frame
    exactly — a streamed doc lands in the same buckets the batch index
    holds, so a stream-static join sees every collision the batch
    self-join would."""
    df, _, _ = corpus
    k, bands, rpb = 16, 4, 4
    sigs = dedup.minhash_signatures(df, k=k)
    want = {
        (r["id"], r["band"], r["bucket"])
        for r in dedup._banded(sigs, bands, rpb).collect()
    }
    got = {
        (r["id"], r["b"]["band"], r["b"]["bucket"])
        for r in sigs.select(
            "id",
            F.explode(
                dedup.lsh_buckets_expr(F.col("sig"), bands, rpb)
            ).alias("b"),
        ).collect()
    }
    assert got == want


def test_dedup_exact_incremental_matches_full_corpus_run(spark):
    """The admitted set must be EXACTLY the new-doc subset of
    dedup_exact over index-corpus ∪ batch: index dups drop, exact
    within-batch dups keep min id, whitespace/case normalization
    applies (content_fingerprint), and the updated index carries
    index ∪ admitted fingerprints."""
    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx

    corpus = [
        (1, "the quick brown fox"),
        (2, "entirely different content"),
    ]
    batch = [
        (101, "THE QUICK BROWN FOX"),      # case-normalized dup of index 1
        (102, "fresh new document"),
        (103, "Fresh New DOCUMENT"),       # case dup of 102 -> min id wins
        (104, "another fresh one"),
    ]
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    index = cdf.select(
        tx.content_fingerprint(F.col("text")).alias("fingerprint")
    )

    admitted, updated = dedup.dedup_exact_incremental(bdf, index)
    got = sorted(r["doc_id"] for r in admitted.collect())
    assert got == [102, 104]
    assert admitted.columns == bdf.columns

    # invariant: ≡ new-doc subset of the full-corpus dedup_exact
    full = spark.createDataFrame(corpus + batch, "doc_id long, text string")
    want = sorted(
        r["doc_id"]
        for r in dedup.dedup_exact(full).collect()
        if r["doc_id"] >= 100
    )
    assert got == want

    # updated index = index ∪ admitted fingerprints
    ups = sorted(r["fingerprint"] for r in updated.collect())
    want_fps = sorted(
        r["f"]
        for r in cdf.select(
            tx.content_fingerprint(F.col("text")).alias("f")
        ).collect()
    ) + sorted(
        r["f"]
        for r in bdf.filter(F.col("doc_id").isin(102, 104))
        .select(tx.content_fingerprint(F.col("text")).alias("f"))
        .collect()
    )
    assert ups == sorted(want_fps)

    # second day: re-feeding the same batch against the updated index
    # admits nothing (idempotence)
    again, _ = dedup.dedup_exact_incremental(bdf, updated)
    assert again.count() == 0


def test_bloom_fill_fraction_and_saturation_guard(spark):
    """bloom_fill_fraction equals a popcount over the collected bitmap
    words / m_bits, and the opt-in max_fill guard trips LOUDLY on a
    deliberately undersized bitmap (m_bits=64 over hundreds of keys
    saturates toward fill=1 — the regime where the prefilter silently
    stops prefiltering) while a sized bitmap passes the same bound
    with identical gate output (r10 verdict ask #1)."""
    fps = spark.createDataFrame(
        [(f"fp-{i}",) for i in range(400)], "fingerprint string"
    )

    # fill twin: sum of popcounts over the sparse words / m_bits
    for m in (64, 1 << 12, 1 << 16):
        bmp = dedup.bloom_bitmap(fps, m_bits=m, k=5)
        want = sum(
            bin(r["bits"] & ((1 << 64) - 1)).count("1") for r in bmp.collect()
        ) / m
        assert abs(dedup.bloom_fill_fraction(bmp, m) - want) < 1e-12

    tiny = dedup.bloom_bitmap(fps, m_bits=64, k=5)
    assert dedup.bloom_fill_fraction(tiny, 64) > 0.9  # saturated

    with pytest.raises(ValueError, match="saturated"):
        dedup.bloom_maybe(fps, tiny, m_bits=64, k=5, max_fill=0.5)

    # the guard threads through both bloom gates
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx

    index = docs.limit(5).select(
        tx.content_fingerprint(F.col("text")).alias("fingerprint")
    )
    sat = dedup.bloom_bitmap(
        spark.createDataFrame(
            [(f"x-{i}",) for i in range(400)], "fingerprint string"
        ),
        m_bits=64,
        k=5,
    )
    with pytest.raises(ValueError, match="saturated"):
        adm, _, _ = dedup.dedup_exact_incremental_bloom(
            docs, index, sat, m_bits=64, k=5, max_fill=0.5
        )
        adm.count()
    line_sat = dedup.bloom_bitmap(
        spark.createDataFrame(
            [(i, i + 1) for i in range(400)], "h long, h2 long"
        ),
        m_bits=64,
        k=5,
        fp_col=("h", "h2"),
    )
    with pytest.raises(ValueError, match="saturated"):
        cleaned, _, _ = dedup.dedup_lines_incremental_bloom(
            docs,
            spark.createDataFrame([], "h long, h2 long"),
            line_sat,
            m_bits=64,
            k=5,
            max_fill=0.5,
        )
        cleaned.count()

    # a correctly sized bitmap sails under the same bound, gate
    # output identical with and without the guard
    good = dedup.bloom_bitmap(index, m_bits=1 << 16, k=5)
    assert dedup.bloom_fill_fraction(good, 1 << 16) < 0.01
    guarded, _, _ = dedup.dedup_exact_incremental_bloom(
        docs, index, good, m_bits=1 << 16, max_fill=0.5
    )
    bare, _, _ = dedup.dedup_exact_incremental_bloom(
        docs, index, good, m_bits=1 << 16
    )
    assert sorted(r["doc_id"] for r in guarded.collect()) == sorted(
        r["doc_id"] for r in bare.collect()
    )


def test_bloom_bitmap_matches_python_twin(spark):
    """The distributed bloom bitmap reproduces a dependency-free
    Python twin bit-for-bit: k xxhash64-seeded probe positions per
    fingerprint (testing/xxh64.py), pmod to m, word = pos >> 6, OR of
    the in-word masks — including the signed-long wrap of bit 63.
    NULL fingerprints contribute nothing."""
    from topn_clashroyal_etl_sql_snapshot_spark.testing.xxh64 import (
        spark_xxhash64,
    )

    m, k = 1 << 12, 4
    fps = [f"fp-{i:02d}" for i in range(25)]
    df = spark.createDataFrame(
        [(f,) for f in fps] + [(None,)], "fingerprint string"
    )
    got = {
        r["word"]: r["bits"]
        for r in dedup.bloom_bitmap(df, m_bits=m, k=k).collect()
    }

    words: dict[int, int] = {}
    for f in fps:
        for i in range(k):
            pos = spark_xxhash64([("long", i), ("string", f)]) % m
            words[pos >> 6] = words.get(pos >> 6, 0) | (1 << (pos & 63))
    want = {
        w: (b - (1 << 64) if b >= (1 << 63) else b) for w, b in words.items()
    }
    assert got == want

    # no false negatives: every fingerprint the bitmap was built over
    # reports maybe=true
    verdicts = dedup.bloom_maybe(df, dedup.bloom_bitmap(df, m, k), m, k)
    assert all(r["bloom_maybe"] for r in verdicts.collect())
    assert verdicts.count() == len(fps)  # NULL row dropped

    # the broadcast_bitmap=False arm (the >10^9-doc-index shape: a
    # word-keyed shuffle join instead of a bitmap broadcast) returns
    # the identical verdict set
    shuffled = dedup.bloom_maybe(
        df, dedup.bloom_bitmap(df, m, k), m, k, broadcast_bitmap=False
    )
    assert sorted(map(tuple, shuffled.collect())) == sorted(
        map(tuple, verdicts.collect())
    )


@pytest.mark.parametrize("m_bits", [64, 1 << 20])
def test_bloom_incremental_gate_identity(spark, m_bits):
    """dedup_exact_incremental_bloom admits EXACTLY the plain gate's
    set — at m_bits=64 the bloom saturates (near-100% false positives,
    every fingerprint probes the same word) and the residual exact
    hits join must rescue correctness; at 2^20 the maybe set is
    essentially the true duplicates. The updated bitmap must equal a
    fresh build over the updated index, and a same-batch re-feed
    admits nothing."""
    rng = random.Random(11)
    mk = lambda n: " ".join(rng.choice(WORDS) for _ in range(n))  # noqa: E731
    corpus = [(i, mk(12)) for i in range(40)]
    batch = (
        [(100 + i, mk(12)) for i in range(30)]
        + [(200 + i, corpus[i][1].upper()) for i in range(8)]  # index dups
        + [(300, None), (301, None)]  # NULL texts: exempt, BOTH survive
    )
    batch.append((400, batch[0][1]))  # within-batch dup, min id wins
    cdf = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(batch, "doc_id long, text string")
    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx

    index = cdf.select(
        tx.content_fingerprint(F.col("text")).alias("fingerprint")
    )
    bitmap = dedup.bloom_bitmap(index, m_bits=m_bits)

    plain_adm, plain_idx = dedup.dedup_exact_incremental(bdf, index)
    adm, idx, bmp2 = dedup.dedup_exact_incremental_bloom(
        bdf, index, bitmap, m_bits=m_bits
    )
    assert sorted(r["doc_id"] for r in adm.collect()) == sorted(
        r["doc_id"] for r in plain_adm.collect()
    )
    assert adm.columns == bdf.columns
    assert sorted(r["fingerprint"] or "" for r in idx.collect()) == sorted(
        r["fingerprint"] or "" for r in plain_idx.collect()
    )
    # updated bitmap ≡ fresh build over the updated index
    got_b = {r["word"]: r["bits"] for r in bmp2.collect()}
    want_b = {
        r["word"]: r["bits"]
        for r in dedup.bloom_bitmap(idx, m_bits=m_bits).collect()
    }
    assert got_b == want_b
    # NULL-text exemption: both NULL rows are admitted (they carry no
    # content identity), and neither enters the persisted index
    assert {300, 301} <= {r["doc_id"] for r in adm.collect()}
    assert all(r["fingerprint"] is not None for r in idx.collect())
    # idempotent re-feed against the updated (index, bitmap) pair —
    # idempotence is a property of the DEDUPLICABLE rows: the exempt
    # NULL-text rows are re-admitted by design, everything else drops
    again, _, _ = dedup.dedup_exact_incremental_bloom(
        bdf, idx, bmp2, m_bits=m_bits
    )
    assert sorted(r["doc_id"] for r in again.collect()) == [300, 301]


def test_bloom_gate_plan_broadcasts_never_shuffles_index(spark):
    """The design point of the bloom gate: the persisted index is
    probed by a BROADCAST of the (tiny) bloom-maybe set — the plan
    must carry broadcast joins only, with no SortMergeJoin (an index
    shuffle at 100 TB), no cartesian, and no Python nodes anywhere."""
    docs = spark.createDataFrame(
        [(i, f"text number {i}") for i in range(20)],
        "doc_id long, text string",
    )
    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx

    index = docs.filter(F.col("doc_id") < 10).select(
        tx.content_fingerprint(F.col("text")).alias("fingerprint")
    )
    bitmap = dedup.bloom_bitmap(index)
    adm, _, _ = dedup.dedup_exact_incremental_bloom(
        docs.filter(F.col("doc_id") >= 5), index, bitmap
    )
    # STATIC plan: the index-probe broadcast is by construction (the
    # explicit F.broadcast on the maybe side), not AQE luck — the index
    # side streams into an Inner BuildRight BHJ with no Exchange above
    # its scan. The batch-side joins may plan SMJ statically at toy
    # stats; that's what the final-plan check below covers.
    import re as _re

    static = adm._jdf.queryExecution().executedPlan().toString()
    assert _re.search(
        r"BroadcastHashJoin \[fingerprint#\d+\], \[fingerprint#\d+\], "
        r"Inner, BuildRight",
        static,
    ), static
    assert "CartesianProduct" not in static
    assert "BatchEvalPython" not in static and "ArrowEvalPython" not in static
    assert sorted(r["doc_id"] for r in adm.collect()) == list(range(10, 20))
    # FINAL AQE plan (post-run): every join resolved broadcast — the
    # only shuffles left are the batch-keyed aggregations.
    final = (
        adm._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]  # the dump appends the pre-AQE plan
    )
    assert "isFinalPlan=true" in final
    assert "SortMergeJoin" not in final and "ShuffledHashJoin" not in final


@pytest.mark.parametrize("seed,cap", [(0, 3), (1, 6), (2, None)])
def test_minhash_incremental_invariant_randomized(spark, seed, cap):
    """The cap-for-cap subset invariant on RANDOMIZED corpora: for a
    seeded random mix of unique docs, planted near-dup clusters of
    varying size, and varying caps (including uncapped), the
    incremental pairs must equal the new-doc-involving subset of the
    full-corpus run with the same cap — same orientation rules as the
    fixed-case tests."""
    import random

    rng = random.Random(seed)
    words = [f"w{i}" for i in range(40)]

    def doc():
        return " ".join(rng.choice(words) for _ in range(rng.randint(8, 20)))

    rows = []
    next_id = 0
    for _ in range(6):            # planted clusters, sizes 2..6
        base = doc()
        for c in range(rng.randint(2, 6)):
            rows.append((next_id, base + f" tail{c}"))
            next_id += 1
    for _ in range(8):            # unique docs
        rows.append((next_id, doc()))
        next_id += 1
    rng.shuffle(rows)

    new_ids = {i for i, _ in rows if i % 3 == 0}
    cdf = spark.createDataFrame(
        [r for r in rows if r[0] not in new_ids], "doc_id long, text string"
    )
    bdf = spark.createDataFrame(
        [r for r in rows if r[0] in new_ids], "doc_id long, text string"
    )
    full = spark.createDataFrame(rows, "doc_id long, text string")

    # bands*rows_per_band must fit k=32 (the r11 overflow guard —
    # this test previously ran the default 32x4 layout against k=32,
    # i.e. 24 dead constant-bucket bands on BOTH arms)
    index = dedup.minhash_signatures(cdf, k=32)
    pairs, _ = dedup.minhash_lsh_incremental(
        bdf, index, k=32, bands=8, rows_per_band=4,
        threshold=0.3, max_bucket=cap
    )
    got = {
        (r["id1"], r["id2"]): round(r["est_jaccard"], 9)
        for r in pairs.collect()
    }
    ref_all = {
        (r["id1"], r["id2"]): round(r["est_jaccard"], 9)
        for r in dedup.minhash_lsh_pairs(
            full, k=32, bands=8, rows_per_band=4,
            threshold=0.3, max_bucket=cap
        ).collect()
    }
    ref = {}
    for (a, b), j in ref_all.items():
        if a in new_ids and b not in new_ids:
            ref[(a, b)] = j
        elif b in new_ids and a not in new_ids:
            ref[(b, a)] = j
        elif a in new_ids and b in new_ids:
            ref[(min(a, b), max(a, b))] = j
    assert got == ref


def test_simhash_incremental_matches_full_corpus_plan(spark):
    """The pigeonhole incremental must equal the new-doc-involving
    subset of simhash_candidate_pairs over batch ∪ index (oriented
    new-first / within-batch min-max), the cap must hold cap-for-cap,
    and hamming values must match bit_count ground truth."""
    idx = [
        (1, 0x0F0F0F0F0F0F0F0F),
        (2, 0x0F0F0F0F0F0F0F0E),   # hamming 1 from 1
        (3, 0x7777000011112222),
    ]
    batch = [
        (101, 0x0F0F0F0F0F0F0F0B),  # hamming 1 from 1 (F^B=0100), 2 from 2
        (102, 0x7777000011112223),  # hamming 1 from 3
        (103, 0x7777000011112221),  # hamming 1 from 102, 2 from 3
        (104, -0x123456789ABCDF0),  # negative long: sign-bit chunks
    ]
    idf = spark.createDataFrame(idx, "id long, sh64 long")
    bdf = spark.createDataFrame(batch, "id long, sh64 long")
    full = spark.createDataFrame(idx + batch, "id long, sh64 long")

    for cap in (None, 10_000):
        got = {
            (r["id1"], r["id2"]): r["hamming"]
            for r in dedup.simhash_incremental_pairs(
                bdf, idf, max_hamming=7, chunks=8, max_bucket=cap
            ).collect()
        }
        ref_all = {
            (r["id1"], r["id2"]): r["hamming"]
            for r in dedup.simhash_candidate_pairs(
                full, max_hamming=7, chunks=8, max_bucket=cap
            ).collect()
        }
        new_ids = {101, 102, 103, 104}
        ref = {}
        for (a, b), h in ref_all.items():
            if a in new_ids and b not in new_ids:
                ref[(a, b)] = h
            elif b in new_ids and a not in new_ids:
                ref[(b, a)] = h
            elif a in new_ids and b in new_ids:
                ref[(min(a, b), max(a, b))] = h
        assert got == ref and got, (cap, got, ref)
    # ground-truth hammings
    assert got[(101, 1)] == 1 and got[(102, 3)] == 1 and got[(102, 103)] == 1

    # capped: a 40-copy flood in the index exceeds cap 30 in every
    # chunk and contributes nothing; the genuine pair survives
    flood = spark.createDataFrame(
        [(500 + i, 0x5A5A5A5A5A5A5A5A) for i in range(40)], "id long, sh64 long"
    )
    got_capped = {
        (r["id1"], r["id2"])
        for r in dedup.simhash_incremental_pairs(
            bdf, idf.unionAll(flood), max_hamming=7, chunks=8, max_bucket=30
        ).collect()
    }
    assert (102, 3) in got_capped
    assert not any(b >= 500 for _, b in got_capped)


def test_spread_plan_probe_ignores_node_words_in_literals(spark, tmp_path):
    """r11 advisor finding: the wide-plan probe must anchor node names
    to plan-tree line starts — a filter literal containing 'Join us'
    (or a column named Sort_key) is still a NARROW plan and gets the
    CPU-spread repartition; a genuine aggregate plan is still detected
    as wide and skipped."""
    par = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "narrow.parquet")
    spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)],
        "doc_id long, Sort_key string",
    ).coalesce(1).write.parquet(p)
    # a tiny parquet scan is one split → one partition, and scan+filter
    # is a narrow plan — the probe must spread it despite the literal
    narrow = spark.read.parquet(p).filter(
        F.col("Sort_key") != "Join us, Window shoppers Union"
    )
    assert narrow.rdd.getNumPartitions() < par
    spread = dedup._spread(narrow, "doc_id")
    assert spread.rdd.getNumPartitions() == par
    wide = (
        spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
        .groupBy("doc_id")
        .count()
    )
    assert dedup._spread(wide, "doc_id") is wide


def _keeper_map(rows):
    return {r["id"]: (r["comp"], r["keep"]) for r in rows}


def test_component_keepers_incremental_basics(spark):
    """Changed-components-only keeper recompute: a batch edge merging
    two old components re-picks ONE champion across the union (the
    stale keeper rows keyed by the losing component's OLD label must
    vanish, not survive as a duplicate champion); untouched components
    reuse their prior decisions byte-for-byte; the result equals the
    full component_keepers over the updated labels."""
    hist = spark.createDataFrame(
        [(2, 3), (5, 6), (100, 101)], "id1 long, id2 long"
    )
    labels0 = dedup.connected_components(hist)
    scores = spark.createDataFrame(
        [(2, 1.0), (3, 9.0), (5, 2.0), (6, 8.0), (100, 4.0), (101, 3.0)],
        "id long, score double",
    )
    keep0 = dedup.component_keepers(labels0, scores)
    assert _keeper_map(keep0.collect())[6] == (5, True)  # comp 5 champion

    new = spark.createDataFrame([(3, 6)], "id1 long, id2 long")
    labels1 = dedup.connected_components_incremental(labels0, new)
    got = _keeper_map(
        dedup.component_keepers_incremental(
            labels1, keep0, new, scores
        ).collect()
    )
    want = _keeper_map(dedup.component_keepers(labels1, scores).collect())
    assert got == want
    # merged component {2,3,5,6} relabeled to 2; 3 (score 9) is the one
    # champion — old comp-5 keeper rows are gone, untouched 100 stands
    assert got[3] == (2, True) and got[6] == (2, False)
    assert got[100] == (100, True) and got[101] == (100, False)
    assert sum(1 for c, k in got.values() if k and c == 2) == 1

    # idempotent re-feed: same batch against updated labels + keepers
    again = _keeper_map(
        dedup.component_keepers_incremental(
            labels1,
            dedup.component_keepers_incremental(labels1, keep0, new, scores),
            new,
            scores,
        ).collect()
    )
    assert again == got


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15])
def test_component_keepers_incremental_matches_full(spark, seed):
    """Randomized differential over (history, batch) splits: incremental
    keeper recompute ≡ full component_keepers(updated labels) — random
    graphs, partial scores (unscored members exercise the min-id
    fallback), both score polarities."""
    rng = random.Random(seed)
    hist_edges = [
        (rng.randrange(60), rng.randrange(60)) for _ in range(40)
    ]
    hist_edges = [(a, b) for a, b in hist_edges if a != b]
    new_edges = [
        (rng.randrange(90), rng.randrange(90)) for _ in range(30)
    ]
    new_edges = [(a, b) for a, b in new_edges if a != b]
    ids = sorted({x for e in hist_edges + new_edges for x in e})
    scored = [
        (i, round(rng.uniform(0, 10), 3)) for i in ids if rng.random() < 0.7
    ]
    hdf = spark.createDataFrame(hist_edges, "id1 long, id2 long")
    ndf = spark.createDataFrame(new_edges, "id1 long, id2 long")
    sdf = spark.createDataFrame(scored, "id long, score double")
    hib = seed % 2 == 0

    labels0 = dedup.connected_components(hdf)
    keep0 = dedup.component_keepers(labels0, sdf, higher_is_better=hib)
    labels1 = dedup.connected_components_incremental(labels0, ndf)
    got = _keeper_map(
        dedup.component_keepers_incremental(
            labels1, keep0, ndf, sdf, higher_is_better=hib
        ).collect()
    )
    want = _keeper_map(
        dedup.component_keepers(labels1, sdf, higher_is_better=hib).collect()
    )
    assert got == want


def test_component_keepers_incremental_fuse_and_plan(spark, tmp_path):
    """The batch fuse trips before any work; on persisted parquet
    frames (a real day-N run) the final adaptive plan joins everything
    by broadcast at this size — the persisted keepers/labels frames are
    never sort-merge/shuffle-hash joined, and no Python or cartesian
    appears anywhere."""
    hist = spark.createDataFrame(
        [(i, i + 1000) for i in range(100)], "id1 long, id2 long"
    )
    scores = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(2000)], "id long, score double"
    )
    lab_p, keep_p = str(tmp_path / "lab"), str(tmp_path / "keep")
    labels0 = dedup.connected_components(hist)
    labels0.write.parquet(lab_p)
    labels0 = spark.read.parquet(lab_p)
    dedup.component_keepers(labels0, scores).write.parquet(keep_p)
    keep0 = spark.read.parquet(keep_p)

    batch = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "id1 long, id2 long"
    )
    with pytest.raises(ValueError, match="max_batch_pairs"):
        dedup.component_keepers_incremental(
            labels0, keep0, batch, scores, max_batch_pairs=5
        )
    labels1 = dedup.connected_components_incremental(labels0, batch)
    out = dedup.component_keepers_incremental(labels1, keep0, batch, scores)
    out.collect()
    plan = (
        out._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]  # AQE appends pre-adaptive SMJs
    )
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan


def test_piece_radius_expansion_guarantee_and_guards(spark):
    """piece_radius=1 extends the pigeonhole guarantee to 2·chunks−1:
    every pair within that radius is found (exhaustively planted — one
    fingerprint per hamming distance 0..radius via prefix bit flips,
    where the exact-piece join provably misses the upper half);
    piece_radius=2 raises; results carry exact hammings."""
    chunks = 4  # radius 7 with expansion, 3 exact
    base = 0x0123456789ABCDEF
    rows = [(0, base)]
    for h in range(1, 8):
        rows.append((h, base ^ ((1 << h) - 1)))  # h low-bit flips
    # 7 flips SPREAD 2/2/2/1 across the four 16-bit pieces: no clean
    # piece (exact join must miss), but piece 3 carries exactly one
    # flip — the expansion must catch it at the guarantee boundary
    spread = (1 | 2) | (3 << 16) | (3 << 32) | (1 << 48)
    rows.append((99, base ^ spread))
    fps = spark.createDataFrame(rows, "id long, sh64 long")
    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in dedup.simhash_candidate_pairs(
            fps, max_hamming=7, chunks=chunks, piece_radius=1
        ).collect()
    }
    # pair (0, h) differs in exactly h bits — ALL must be present
    for h in range(1, 8):
        assert got[(0, h)] == h, (h, got)
    assert got[(0, 99)] == 7
    # the exact-piece join at the same layout misses the spread pair
    exact = {
        (r["id1"], r["id2"])
        for r in dedup.simhash_candidate_pairs(
            fps, max_hamming=7, chunks=chunks, piece_radius=0
        ).collect()
    }
    assert (0, 99) not in exact
    import pytest as _pytest

    with _pytest.raises(ValueError, match="piece_radius"):
        dedup.simhash_candidate_pairs(fps, 7, chunks, piece_radius=2)


def test_dense_and_sparse_verification_agree(spark):
    """true_jaccard_for_pairs_dense ≡ true_jaccard_for_pairs on the
    same candidate list and postings — same pairs, same jaccards
    (the dense path is a plan choice, not a semantic one)."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "the quick brown fox leaps over the lazy dog"),
            (4, "completely different text about spark plans"),
            (5, "completely different text about spark plans entirely"),
        ],
        "doc_id long, text string",
    )
    postings = dedup.hashed_postings(docs)
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (4, 5), (1, 4)], "id1 long, id2 long"
    )
    sparse = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.true_jaccard_for_pairs(cands, postings, 0.3).collect()
    }
    dense = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.true_jaccard_for_pairs_dense(
            cands, postings, 0.3
        ).collect()
    }
    assert sparse == dense and sparse


def test_length_filter_is_a_plan_choice_not_a_semantic_one(spark):
    """true_jaccard_for_pairs(length_filter=True) ≡ the default plan —
    the AllPairs prune drops only pairs that cannot verify (min size <
    t·max size), so results are identical; the flag exists because the
    prune's fixed costs only pay on low-precision screens (r12 verdict
    finding #2: applying it unconditionally regressed the
    high-precision MinHash paths)."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "short text"),
            (4, "the quick brown fox jumps over the lazy dog and then "
                "keeps running through a much longer stretch of prose "
                "that inflates its shingle set well past doc one's"),
        ],
        "doc_id long, text string",
    )
    postings = dedup.hashed_postings(docs)
    cands = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 4)], "id1 long, id2 long"
    )
    plain = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.true_jaccard_for_pairs(cands, postings, 0.3).collect()
    }
    filtered = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in dedup.true_jaccard_for_pairs(
            cands, postings, 0.3, length_filter=True
        ).collect()
    }
    assert plain == filtered and plain


def test_simhash_screenless_dense_plan_fires_and_matches(spark, monkeypatch):
    """On a template-compressed corpus the r13 volume estimator must
    pick the SCREENLESS plan (simhash_candidate_pairs never runs —
    pinned by a raising monkeypatch) and its output must equal the
    screened pipeline assembled by hand at the same layout: exact
    verification + hamming post-filter ≡ pigeonhole screen + per-pair
    verification wherever bucket caps don't fire."""
    texts = [
        (i, "common template words repeated across every document "
            "in this synthetic crawl slice " * 3 + f"tail marker {i % 7}")
        for i in range(300)
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    # ground truth: the screened plan assembled by hand (layout pinned)
    fps = dedup.simhash_fingerprints(docs)
    cands = dedup.simhash_candidate_pairs(
        fps, max_hamming=15, chunks=8, piece_radius=1
    )
    postings = dedup.hashed_postings(docs)
    want = {
        (r["id1"], r["id2"]): round(r["jaccard"], 9)
        for r in dedup.true_jaccard_for_pairs(cands, postings, 0.5).collect()
    }

    def _boom(*a, **k):  # pragma: no cover — fires only on regression
        raise AssertionError(
            "screenless regime regressed: simhash_candidate_pairs ran"
        )

    monkeypatch.setattr(dedup, "simhash_candidate_pairs", _boom)
    got = {
        (r["id1"], r["id2"]): round(r["jaccard"], 9)
        for r in dedup.simhash_verified_pairs(
            docs, threshold=0.5, chunks=8, piece_radius=1
        ).collect()
    }
    assert got == want and got


def test_simhash_mixed_regime_corpus_stays_correct(spark, monkeypatch):
    """r14 (r13 verdict next #3): a corpus HALF template-compressed,
    half spread — the Σ C(m,2) estimator is a GLOBAL decision, so the
    template cluster alone pushes the whole corpus onto the screenless
    plan even though the spread half would have pruned fine. Pins:
    (a) the screenless plan fires on the mixed corpus (the template
    half dominates the estimate); (b) output ≡ the screened pipeline
    assembled by hand at the same layout — INCLUDING the spread half's
    planted near-dup pair, which must survive the regime flip; (c) the
    spread half contributes no spurious pairs. The cost worst-case of
    the global decision is measured and recorded in SCALE.md
    (tools/simhash_mixed_r14.py)."""
    rng = random.Random(7)
    template = [
        (i, "common template words repeated across every document "
            "in this synthetic crawl slice " * 3 + f"tail marker {i % 7}")
        for i in range(200)
    ]
    # spread half: unique token streams, plus ONE planted near-dup
    # pair (ids 9000/9001) the regime flip must not lose
    spread_text = " ".join(f"w{rng.randrange(100_000)}" for _ in range(40))
    spread = [
        (1000 + i, f"doc {i} " + " ".join(
            f"w{rng.randrange(100_000)}" for _ in range(40)))
        for i in range(200)
    ] + [
        (9000, spread_text),
        (9001, spread_text + " banner"),
    ]
    docs = spark.createDataFrame(
        template + spread, "doc_id long, text string"
    )

    # ground truth: the screened plan assembled by hand, same layout
    fps = dedup.simhash_fingerprints(docs)
    cands = dedup.simhash_candidate_pairs(
        fps, max_hamming=15, chunks=8, piece_radius=1
    )
    postings = dedup.hashed_postings(docs)
    want = {
        (r["id1"], r["id2"]): round(r["jaccard"], 9)
        for r in dedup.true_jaccard_for_pairs(cands, postings, 0.5).collect()
    }
    assert (9000, 9001) in want  # the spread half's planted pair

    def _boom(*a, **k):  # pragma: no cover — fires only on regression
        raise AssertionError(
            "mixed-regime corpus did not take the screenless plan"
        )

    monkeypatch.setattr(dedup, "simhash_candidate_pairs", _boom)
    got = {
        (r["id1"], r["id2"]): round(r["jaccard"], 9)
        for r in dedup.simhash_verified_pairs(
            docs, threshold=0.5, chunks=8, piece_radius=1
        ).collect()
    }
    assert got == want and (9000, 9001) in got
    # no spread-spread pair other than the planted one
    spurious = [
        p for p in got
        if p[0] >= 1000 and p[1] >= 1000 and p != (9000, 9001)
    ]
    assert spurious == []


def test_simhash_spread_fingerprints_keep_the_screen(spark, monkeypatch):
    """Cold fingerprint space (random 64-bit values, wide pieces) must
    stay on the screened plan — the estimator's Σ C(m,2) sits far
    below the dense crossover, and skipping the screen there would pay
    the full inverted-index join for nothing. Pinned by counting
    simhash_candidate_pairs calls."""
    rng = random.Random(13)
    rows = [
        (i, f"doc {i} " + " ".join(
            f"w{rng.randrange(10_000)}" for _ in range(30)))
        for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    calls = []
    real = dedup.simhash_candidate_pairs

    def _counting(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(dedup, "simhash_candidate_pairs", _counting)
    dedup.simhash_verified_pairs(
        docs, threshold=0.5, chunks=4, piece_radius=0
    ).collect()
    assert calls, "spread corpus unexpectedly took the screenless plan"


def test_simhash_derived_defaults_pick_layout_by_corpus(spark):
    """simhash_verified_pairs' derived defaults: a small corpus takes
    the exact wide-chunk layout; a corpus past the cold-layout radius
    switches to piece expansion — both recall a planted near-dup pair,
    and an explicit chunks pin keeps the legacy behavior."""
    texts = [(i, f"unique document number {i} with filler words "
              f"{'alpha beta gamma delta ' * 3}{i}") for i in range(60)]
    # planted near-dup of doc 0
    texts.append((1000, texts[0][1] + " trailing banner"))
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    # derived path (chunks=None): n=61 → chunks_for=64, exact radius 63
    pairs = {
        (r["id1"], r["id2"])
        for r in dedup.simhash_verified_pairs(docs, threshold=0.5).collect()
    }
    assert (0, 1000) in pairs
    # explicit legacy pin still works
    pairs_pinned = {
        (r["id1"], r["id2"])
        for r in dedup.simhash_verified_pairs(
            docs, threshold=0.5, max_hamming=7, chunks=8
        ).collect()
    }
    assert (0, 1000) in pairs_pinned


def test_simhash_incremental_piece_radius_matches_full_run(spark):
    """piece_radius=1 on the incremental path ≡ the new-doc-involving
    subset of the full-run generator at the same (chunks, radius,
    cap) — including a planted batch-vs-index pair at hamming 10 that
    the exact-piece join provably misses at chunks=8."""
    base = 0x0123456789ABCDEF
    # index: base plus distinct far fingerprints
    idx_rows = [(1, base)] + [(10 + i, (base * (i + 3)) & ((1 << 64) - 1))
                              for i in range(6)]
    # batch: hamming-10 variant of base (flips spread 2/1/2/1/1/1/1/1
    # over the eight 8-bit pieces — no clean piece, one ≤1-flip piece)
    spread = (3 | (1 << 8) | (3 << 16) | (1 << 24) | (1 << 32)
              | (1 << 40) | (1 << 48) | (1 << 56))
    batch_rows = [(101, base ^ spread), (102, 0x5A5A5A5A5A5A5A5A)]
    idf = spark.createDataFrame(idx_rows, "id long, sh64 long")
    bdf = spark.createDataFrame(batch_rows, "id long, sh64 long")

    got = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in dedup.simhash_incremental_pairs(
            bdf, idf, max_hamming=15, chunks=8, piece_radius=1
        ).collect()
    }
    assert got.get((101, 1)) == 10
    # exact-piece incremental at the same layout misses it
    exact = {
        (r["id1"], r["id2"])
        for r in dedup.simhash_incremental_pairs(
            bdf, idf, max_hamming=15, chunks=8, piece_radius=0
        ).collect()
    }
    assert (101, 1) not in exact

    # ≡ the new-involving subset of the full-run generator
    full = {
        (r["id1"], r["id2"]): r["hamming"]
        for r in dedup.simhash_candidate_pairs(
            idf.unionAll(bdf), max_hamming=15, chunks=8, piece_radius=1
        ).collect()
    }
    new_ids = {101, 102}
    want = {}
    for (a, b), h in full.items():
        if a in new_ids and b not in new_ids:
            want[(a, b)] = h
        elif b in new_ids and a not in new_ids:
            want[(b, a)] = h
        elif a in new_ids and b in new_ids:
            want[(min(a, b), max(a, b))] = h
    assert got == want


def test_bloom_probe_tolerates_append_fileset_duplicates(spark):
    """r16 (append-only bloom state): a bitmap carrying SEVERAL rows
    per word — the accumulated daily deltas of the ingest loop's bloom
    state — must probe exactly like the bit_or-merged bitmap (the
    pre-r16 per-probe bool_and would false-NEGATIVE on bits split
    across delta rows, breaking the gate's no-false-negative identity
    contract), the incremental gate must admit the identical set over
    either layout, and fill telemetry must not double-count bits set
    in more than one delta."""
    rng = random.Random(23)
    mk = lambda n: " ".join(rng.choice(WORDS) for _ in range(n))  # noqa: E731
    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx

    day1 = spark.createDataFrame(
        [(i, mk(12)) for i in range(30)], "doc_id long, text string"
    ).select(tx.content_fingerprint(F.col("text")).alias("fingerprint"))
    day2 = spark.createDataFrame(
        [(100 + i, mk(12)) for i in range(30)], "doc_id long, text string"
    ).select(tx.content_fingerprint(F.col("text")).alias("fingerprint"))
    m = 1 << 10  # small: forces many shared words across the deltas
    b1 = dedup.bloom_bitmap(day1, m_bits=m)
    b2 = dedup.bloom_bitmap(day2, m_bits=m)
    appended = b1.unionAll(b2)  # the append-state layout (dup words)
    merged = dedup.bloom_bitmap_merge(b1, b2)
    # dup words actually present, else the test pins nothing
    n_rows = appended.count()
    assert n_rows > merged.count()

    probes = day1.unionAll(day2).unionAll(
        spark.createDataFrame(
            [(900 + i, mk(12)) for i in range(20)],
            "doc_id long, text string",
        ).select(tx.content_fingerprint(F.col("text")).alias("fingerprint"))
    )
    got = {
        r["fingerprint"]: r["bloom_maybe"]
        for r in dedup.bloom_maybe(probes, appended, m_bits=m).collect()
    }
    want = {
        r["fingerprint"]: r["bloom_maybe"]
        for r in dedup.bloom_maybe(probes, merged, m_bits=m).collect()
    }
    assert got == want
    # every indexed fingerprint still reports maybe=True (the
    # no-false-negative contract, over the duplicate layout)
    for r in day1.unionAll(day2).collect():
        assert got[r["fingerprint"]] is True
    # fill telemetry merges before counting: identical either way
    assert dedup.bloom_fill_fraction(appended, m) == pytest.approx(
        dedup.bloom_fill_fraction(merged, m)
    )
    # the incremental gate admits the identical set over either layout
    batch = spark.createDataFrame(
        [(500 + i, mk(12)) for i in range(15)], "doc_id long, text string"
    )
    index = day1.unionAll(day2)
    adm_a, _, _ = dedup.dedup_exact_incremental_bloom(
        batch, index, appended, m_bits=m
    )
    adm_m, _, _ = dedup.dedup_exact_incremental_bloom(
        batch, index, merged, m_bits=m
    )
    assert sorted(r["doc_id"] for r in adm_a.collect()) == sorted(
        r["doc_id"] for r in adm_m.collect()
    )


def test_publish_append_state_compact_fn_remerges_bloom(spark, tmp_path):
    """r16: publish_append_state's compact_fn hook — the bloom state's
    daily duplicate word rows re-aggregate to the canonical
    one-row-per-word bitmap at compaction, equal to a fresh build over
    all fingerprints ever appended."""
    import os

    from topn_clashroyal_etl_sql_snapshot_spark.functions import text as tx
    from topn_clashroyal_etl_sql_snapshot_spark.sinks import snapshot as snap

    m = 1 << 10
    days = []
    rng = random.Random(31)
    mk = lambda n: " ".join(rng.choice(WORDS) for _ in range(n))  # noqa: E731
    for d in range(3):
        days.append(
            spark.createDataFrame(
                [(100 * d + i, mk(12)) for i in range(20)],
                "doc_id long, text string",
            ).select(
                tx.content_fingerprint(F.col("text")).alias("fingerprint")
            )
        )
    g = [str(tmp_path / f"gen-{k}") for k in range(4)]
    os.makedirs(g[0])
    dedup.bloom_bitmap(days[0], m_bits=m).coalesce(1).write.parquet(
        os.path.join(g[0], "bloom")
    )
    merge = lambda df: df.groupBy("word").agg(  # noqa: E731
        F.bit_or("bits").alias("bits")
    )
    # two linked days, then force compaction with max_files=1
    modes = []
    for k, mf in ((1, 64), (2, 64), (3, 1)):
        os.makedirs(g[k])
        modes.append(
            snap.publish_append_state(
                spark,
                os.path.join(g[k - 1], "bloom"),
                os.path.join(g[k], "bloom"),
                dedup.bloom_bitmap(days[min(k, 2)], m_bits=m)
                if k <= 2
                else dedup.bloom_bitmap(days[2], m_bits=m).limit(0),
                max_files=mf,
                compact_fn=merge,
            )
        )
    assert modes[:2] == ["linked", "linked"] and modes[2] == "compacted"
    got = {
        r["word"]: r["bits"]
        for r in spark.read.parquet(os.path.join(g[3], "bloom")).collect()
    }
    fresh = {
        r["word"]: r["bits"]
        for r in dedup.bloom_bitmap(
            days[0].unionAll(days[1]).unionAll(days[2]), m_bits=m
        ).collect()
    }
    assert got == fresh  # canonical one-row-per-word, all days' bits
