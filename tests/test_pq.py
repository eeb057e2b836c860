"""Product-quantization tests (operators/pq.py): fit determinism and
job-count independence from M/K, encode parity with a numpy twin,
reconstruction quality on clustered data, ADC score accuracy, the
full-probe/full-rerank ≡ brute-force equivalence, recall under pruning,
and no-Python/no-cartesian plan pins."""

from __future__ import annotations

import random

import numpy as np
import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import pq, similarity

DIM = 16


def _clustered(spark, n=160, n_clusters=4, noise=0.05, seed=3):
    rng = random.Random(seed)
    centers = [[rng.gauss(0, 1) for _ in range(DIM)] for _ in range(n_clusters)]
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        rows.append((i, [float(x + rng.gauss(0, noise)) for x in c]))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        centers,
        rows,
    )


def test_fit_is_deterministic_and_shaped(spark):
    df, _, _ = _clustered(spark)
    m1 = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=3)
    m2 = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=3)
    assert m1 == m2
    assert m1["dim"] == DIM and m1["sub_dim"] == 4
    assert len(m1["codebooks"]) == 4
    assert all(len(book) == 8 for book in m1["codebooks"])
    assert all(len(c) == 4 for book in m1["codebooks"] for c in book)
    for s, book in enumerate(m1["codebooks"]):
        for j, c in enumerate(book):
            assert m1["norms2"][s][j] == sum(x * x for x in c)


def test_fit_validation(spark):
    df, _, _ = _clustered(spark, n=5)
    with pytest.raises(ValueError):
        pq.fit_pq_codebooks(df, m=5, k=2)  # 16 % 5 != 0
    with pytest.raises(ValueError):
        pq.fit_pq_codebooks(df, m=4, k=64)  # corpus smaller than k
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        pq.fit_pq_codebooks(empty, m=4, k=2)


def test_encode_matches_numpy_argmin(spark):
    """Codes equal numpy's per-subspace argmin L2 (clustered data has
    wide margins, so the integer-scaled argmax can't diverge)."""
    df, _, rows = _clustered(spark)
    model = pq.fit_pq_codebooks(df, m=4, k=4, lloyd_rounds=4)
    got = {r["vec_id"]: list(r["codes"]) for r in pq.pq_encode(df, model).collect()}
    assert len(got) == len(rows)
    books = [np.array(b) for b in model["codebooks"]]
    sd = model["sub_dim"]
    for vid, vec in rows:
        v = np.array(vec)
        expect = [
            int(np.argmin(((books[s] - v[s * sd : (s + 1) * sd]) ** 2).sum(axis=1)))
            for s in range(model["m"])
        ]
        assert got[vid] == expect, vid


def test_reconstruction_tight_on_clustered_data(spark):
    """With k ≥ cluster count per subspace, Lloyd converges codes onto
    the cluster structure: decode error ≪ inter-cluster distance."""
    df, centers, rows = _clustered(spark, noise=0.02)
    model = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=6)
    codes = {r["vec_id"]: r["codes"] for r in pq.pq_encode(df, model).collect()}
    sd = model["sub_dim"]
    errs = []
    for vid, vec in rows:
        recon = np.concatenate(
            [np.array(model["codebooks"][s][codes[vid][s]]) for s in range(4)]
        )
        errs.append(float(np.linalg.norm(recon - np.array(vec))))
    inter = min(
        float(np.linalg.norm(np.array(a) - np.array(b)))
        for i, a in enumerate(centers)
        for b in centers[i + 1 :]
    )
    assert max(errs) < inter / 4


def test_full_probe_full_rerank_equals_brute_force(spark):
    """nprobe = n_coarse and rerank·k ≥ corpus ⇒ the candidate set is
    every pair and the exact re-rank sees them all: pq_topk must equal
    brute_force_topk EXACTLY, cosines included."""
    df, _, _ = _clustered(spark, n=80)
    model = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=3)
    bf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.brute_force_topk(
            df, k=3, query_filter=F.col("vec_id") < 8
        ).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in pq.pq_topk(
            df,
            model,
            k=3,
            n_coarse=8,
            nprobe=8,
            rerank=40,  # 40·3 ≥ 80: every candidate reranked exactly
            query_filter=F.col("vec_id") < 8,
        ).collect()
    }
    assert got == bf


def test_pruned_search_with_cluster_covering_rerank_equals_brute_force(spark):
    """nprobe ≪ n_coarse but rerank·k ≥ cluster size: the coarse probe
    covers the query's cluster (the ivf_topk guarantee on clustered
    data) and the ADC stage ranks all ~40 cluster-mates above the
    off-cluster candidates, so the exact re-rank sees every true
    neighbor — result equals brute force exactly."""
    df, _, _ = _clustered(spark, n=240, n_clusters=6)
    model = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=4)
    qf = F.col("vec_id") < 12
    bf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.brute_force_topk(df, k=3, query_filter=qf).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in pq.pq_topk(
            df, model, k=3, n_coarse=12, nprobe=3, rerank=15, query_filter=qf
        ).collect()
    }
    assert got == bf


def test_small_rerank_returns_near_optimal_scores(spark):
    """Small rerank budget (the production memory knob): inside a tight
    cluster every neighbor is a near-tie, so PQ cannot promise the
    argmax SET — its contract is score QUALITY: the returned rank-i
    cosine is within quantization tolerance of brute force's rank-i
    cosine, for every query and rank."""
    df, _, _ = _clustered(spark, n=240, n_clusters=6)
    model = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=4)
    qf = F.col("vec_id") < 12
    bf = {
        (r["query_id"], r["rank"]): r["cosine"]
        for r in similarity.brute_force_topk(df, k=3, query_filter=qf).collect()
    }
    got = {
        (r["query_id"], r["rank"]): r["cosine"]
        for r in pq.pq_topk(
            df, model, k=3, n_coarse=12, nprobe=3, rerank=3, query_filter=qf
        ).collect()
    }
    assert set(got) == set(bf)
    for key, cos in got.items():
        assert cos >= bf[key] - 0.005, (key, cos, bf[key])


def test_adc_scores_close_to_exact(spark):
    """The ADC approximation (query LUT + code norms) tracks the true
    cosine within quantization error on clustered data."""
    df, _, rows = _clustered(spark, n=80, noise=0.02)
    model = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=6)
    # reuse the internal stages: candidates = a few explicit pairs
    codes = {r["vec_id"]: r["codes"] for r in pq.pq_encode(df, model).collect()}
    vecs = {vid: np.array(v) for vid, v in rows}
    sd = model["sub_dim"]
    for qid, nid in [(0, 4), (1, 5), (2, 7), (0, 1)]:
        qv, nv = vecs[qid], vecs[nid]
        exact = float(qv @ nv / (np.linalg.norm(qv) * np.linalg.norm(nv)))
        recon = np.concatenate(
            [np.array(model["codebooks"][s][codes[nid][s]]) for s in range(4)]
        )
        adc = float(qv @ recon / (np.linalg.norm(qv) * np.linalg.norm(recon)))
        assert abs(adc - exact) < 0.05, (qid, nid)


def test_encode_plan_no_python_no_cartesian(spark):
    df, _, _ = _clustered(spark, n=20)
    model = pq.fit_pq_codebooks(df, m=4, k=4, lloyd_rounds=1)
    plan = (
        pq.pq_encode(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_search_plan_no_python_no_cartesian(spark):
    df, _, _ = _clustered(spark, n=20)
    model = pq.fit_pq_codebooks(df, m=4, k=4, lloyd_rounds=1)
    plan = (
        pq.pq_topk(df, model, k=2, n_coarse=4, nprobe=2, rerank=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    # The query-batch-bounded tables ride BROADCAST joins when the
    # call declares a batch via query_filter — the candidate stream
    # and the corpus vector table must never shuffle for them. After
    # the r9 fusion + the r17 narrow ADC window the batch side is
    # exactly THREE broadcasts: the combined query table (lut + norm +
    # vector) into the ADC projection, the query vector RE-ATTACH onto
    # the ranking survivors (r17 — the vector no longer rides every
    # candidate row through the window shuffle), and the survivors
    # into the re-rank. The r8 shape's separate lut/qnorms/query-
    # vector-fetch broadcasts stay gone.
    from pyspark.sql import functions as F

    batch_plan = (
        pq.pq_topk(
            df, model, k=2, n_coarse=4, nprobe=2, rerank=2,
            query_filter=F.col("vec_id") < 5,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert batch_plan.count("BroadcastHashJoin") == 3
    # probed (nprobe < n_coarse) batches keep the keyed bucket join —
    # no nested-loop pair generation outside the full-probe shortcut
    assert "BroadcastNestedLoopJoin" not in batch_plan
    # full-probe batch (the ADC/exact-mode config): coarse pruning is
    # vacuous and short-circuits to codes × broadcast(query batch) —
    # a bounded BNLJ, never an unhinted CartesianProduct
    full_plan = (
        pq.pq_topk(
            df, model, k=2, n_coarse=4, nprobe=4, rerank=2,
            query_filter=F.col("vec_id") < 5,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in full_plan
    assert "CartesianProduct" not in full_plan


def test_codes_frame_reuse(spark):
    """A persisted pq_encode frame (the compressed index) slots into
    pq_topk unchanged — repeated searches skip re-encoding."""
    df, _, _ = _clustered(spark, n=60)
    model = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=2)
    codes = pq.pq_encode(df, model).localCheckpoint()
    a = sorted(
        map(
            tuple,
            pq.pq_topk(
                df, model, k=2, n_coarse=6, nprobe=6, rerank=30
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            pq.pq_topk(
                df, model, k=2, n_coarse=6, nprobe=6, rerank=30, codes=codes
            ).collect(),
        )
    )
    assert a == b


def test_sampled_fit_is_deterministic_and_usable(spark):
    """sample_rows fits on a hash sample (constant fit cost in corpus
    size) — still deterministic, still a full-shape model, and search
    built on it still matches brute force under full probe + full
    re-rank (sampling degrades codebook QUALITY only, and exact
    re-rank doesn't care)."""
    df, _, _ = _clustered(spark, n=120)
    m1 = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=2, sample_rows=60)
    m2 = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=2, sample_rows=60)
    assert m1 == m2
    assert len(m1["codebooks"]) == 4 and all(len(b) == 8 for b in m1["codebooks"])
    full = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=2)
    assert full != m1  # the sample really changed the fit input
    bf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in similarity.brute_force_topk(
            df, k=2, query_filter=F.col("vec_id") < 5
        ).collect()
    }
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in pq.pq_topk(
            df, m1, k=2, n_coarse=6, nprobe=6, rerank=60,
            query_filter=F.col("vec_id") < 5,
        ).collect()
    }
    assert got == bf


def test_null_and_mismatched_vectors_guarded(spark):
    """Review regression: a NULL-first-row corpus raises a descriptive
    error, and wrong-width vectors are EXCLUDED from encode/search
    rather than silently under-summed."""
    allnull = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="NULL"):
        pq.fit_pq_codebooks(allnull, m=2, k=1)

    df, _, _ = _clustered(spark, n=40)
    model = pq.fit_pq_codebooks(df, m=4, k=4, lloyd_rounds=1)
    mixed = df.unionAll(
        spark.createDataFrame(
            [(999, [1.0, 2.0]), (998, None)],
            "vec_id long, embedding array<float>",
        )
    )
    codes = pq.pq_encode(mixed, model)
    ids = {r["vec_id"] for r in codes.collect()}
    assert 999 not in ids and 998 not in ids and len(ids) == 40


def test_fit_dim_is_majority_width_not_first_row(spark):
    """Review regression: a corrupt short vector must not set the model
    dim — the majority width wins, the outlier is excluded (with a
    warning), and the real corpus encodes fully."""
    import warnings as _w

    df, _, _ = _clustered(spark, n=30)
    corrupt = spark.createDataFrame(
        [(-1, [1.0, 2.0])], "vec_id long, embedding array<float>"
    )
    mixed = corrupt.unionAll(df)  # corrupt row ordered first
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        model = pq.fit_pq_codebooks(mixed, m=4, k=4, lloyd_rounds=1)
    assert model["dim"] == DIM
    assert any("majority" in str(c.message) for c in caught)
    ids = {r["vec_id"] for r in pq.pq_encode(mixed, model).collect()}
    assert len(ids) == 30 and -1 not in ids


def test_stale_codes_rows_never_eat_survivor_slots(spark):
    """A codes index carrying rows since REMOVED from the corpus frame
    must not occupy ADC survivor slots in the full-probe shortcut (they
    would then vanish at the re-rank's vector fetch and return < k
    rows): both the probed and the full-probe paths draw candidates
    from embeddings ∩ codes, so results are identical to searching
    with a freshly-synced index."""
    df, _, _ = _clustered(spark, n=40)
    model = pq.fit_pq_codebooks(df, m=4, k=8, lloyd_rounds=2)
    codes = pq.pq_encode(df, model)
    # corpus shrinks after encoding: drop a quarter of the docs but
    # keep the STALE full index
    live = df.filter(F.col("vec_id") % 4 != 0)
    fresh_codes = pq.pq_encode(live, model)
    kw = dict(
        k=3, n_coarse=4, rerank=30, query_filter=F.col("vec_id") == 1
    )
    want = sorted(
        map(tuple, pq.pq_topk(live, model, nprobe=4, codes=fresh_codes, **kw).collect())
    )
    for nprobe in (4, 3):  # full-probe shortcut AND probed path
        got = sorted(
            map(
                tuple,
                pq.pq_topk(live, model, nprobe=nprobe, codes=codes, **kw).collect(),
            )
        )
        assert got == want, (nprobe, got, want)
        assert len(got) == 3


def test_pq_degenerate_guards_r11(spark):
    """r11 review hardening: NULL-element vectors are excluded from
    fit/encode (they crashed the driver fit when seeded and silently
    under-summed codes otherwise) and from the query side (they
    returned k arbitrary neighbors at cosine NULL); a shape-truncated
    persisted model fails fast instead of reading misaligned flat
    indices; nprobe=0 raises instead of silently returning empty."""
    import pytest

    rows = [(i, [float(i), float(i + 1), 1.0, 2.0]) for i in range(12)]
    rows.append((100, [1.0, None, 3.0, 4.0]))   # NULL element
    rows.append((101, None))                    # NULL vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    model = pq.fit_pq_codebooks(df, m=2, k=4, lloyd_rounds=2)
    codes = pq.pq_encode(df, model)
    ids = {r["vec_id"] for r in codes.collect()}
    assert 100 not in ids and 101 not in ids and 0 in ids

    # NULL-element query: absent from results, not k NULL-cosine rows
    out = pq.pq_topk(
        df, model, k=2, query_filter=F.col("vec_id").isin(0, 100)
    )
    got = {r["query_id"] for r in out.collect()}
    assert got == {0}

    # truncated model fails fast
    bad = dict(model)
    bad["codebooks"] = [book[:2] for book in model["codebooks"]]
    with pytest.raises(ValueError, match="codebooks"):
        pq.pq_encode(df, bad)
    bad2 = dict(model)
    bad2["norms2"] = model["norms2"][:1]
    with pytest.raises(ValueError, match="norms2"):
        pq.pq_encode(df, bad2)

    with pytest.raises(ValueError, match="nprobe"):
        pq.pq_topk(df, model, nprobe=0)


def test_fitted_centroids_below_nprobe_take_full_probe_path(spark):
    """r11 advisor finding: when ivf_centroids returns fewer centroids
    than requested (small corpus) and len(cents) <= nprobe < n_coarse,
    the search must switch to the full-probe shortcut (the probed path
    would pay two assignment jobs for an effectively full probe) —
    identical results, visible as the BNLJ short-circuit in the plan."""
    from pyspark.sql import functions as F

    df, _, _ = _clustered(spark, n=20)
    model = pq.fit_pq_codebooks(df, m=4, k=4, lloyd_rounds=1)
    kw = dict(k=2, rerank=30, query_filter=F.col("vec_id") < 5)
    # n_coarse=50 on a 20-vector corpus fits 20 centroids; nprobe=25
    # sits between them — effectively a full probe
    eff_full = pq.pq_topk(df, model, n_coarse=50, nprobe=25, **kw)
    plan = eff_full._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    want = sorted(
        map(tuple, pq.pq_topk(df, model, n_coarse=50, nprobe=50, **kw).collect())
    )
    assert sorted(map(tuple, eff_full.collect())) == want


def test_hof_fit_assignment_bit_identical_to_compiled_kernel(spark):
    """r13: the fit's per-round assignment moved to the HOF form
    (_assign_codes_hof — sample-scale rows should not pay the
    compiled kernel's corpus-scale PLAN cost, re-optimized every
    round). Bit-parity is the contract: replaying the fit's Lloyd
    rounds through the ORIGINAL compiled kernel (_assign_codes
    with_subvec=True, the encode/search path) must reproduce the
    fitted model exactly — same scaled terms in the same fold order,
    same argmax tie-break."""
    df, _, _ = _clustered(spark, n=90, n_clusters=5, seed=17)
    m, k, rounds = 4, 8, 3
    got = pq.fit_pq_codebooks(df, m=m, k=k, lloyd_rounds=rounds)

    sd = DIM // m
    vecs = pq._vec_frame(df, "vec_id", "embedding", dim=DIM)
    seeds = (
        vecs.orderBy(F.xxhash64(F.col("id")), F.col("id")).limit(k).collect()
    )
    books = [
        [[float(x) for x in r["v"][s * sd : (s + 1) * sd]] for r in seeds]
        for s in range(m)
    ]

    def model(bs):
        return {
            "m": m,
            "k": k,
            "sub_dim": sd,
            "dim": DIM,
            "codebooks": bs,
            "norms2": [[sum(x * x for x in c) for c in book] for book in bs],
        }

    for _ in range(rounds):
        assign = pq._assign_codes(vecs, model(books), with_subvec=True)
        stats = (
            assign.groupBy("s", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.round(
                            F.element_at("xs", t + 1) * F.lit(pq._MEAN_SCALE)
                        ).cast("long")
                    ).alias(f"_sx{t}")
                    for t in range(sd)
                ],
            )
            .collect()
        )
        acc = {
            (r["s"], r["code"]): [
                r[f"_sx{t}"] / (r["n"] * pq._MEAN_SCALE) for t in range(sd)
            ]
            for r in stats
        }
        new_books = [
            [acc[(s, j)] if (s, j) in acc else books[s][j] for j in range(k)]
            for s in range(m)
        ]
        if new_books == books:
            break
        books = new_books

    assert got == model(books)
