"""BPE tests (operators/bpe.py): hand-computed merges, the round-trip
invariant, parity with an independent rank-order reference encoder,
deterministic training, and the Spark encode stage feeding real token
counts into packing."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.operators import bpe


def _ref_encode_word(word: bytes, merges) -> list[bytes]:
    """Independent reference: apply merges in TRAINING ORDER, one full
    pass each — the classic slow reference algorithm, equivalent to the
    canonical lowest-rank loop for training-produced merge lists."""
    parts = [word[i : i + 1] for i in range(len(word))]
    for a, b in merges:
        out, i = [], 0
        while i < len(parts):
            if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(parts[i])
                i += 1
        parts = out
    return parts


HELLO_MERGES = [(b"h", b"e"), (b"l", b"l"), (b"he", b"ll"), (b"hell", b"o")]


def test_hand_computed_merge_sequence():
    ranks = {p: i for i, p in enumerate(HELLO_MERGES)}
    vocab = bpe.vocab_from_merges(HELLO_MERGES)
    assert bpe.encode_word(b"hello", ranks) == [b"hello"]
    assert vocab[b"hello"] == 259
    assert bpe.encode_text("hello", ranks, vocab) == [259]
    # pre-tokenizer keeps the leading space on the word
    assert bpe.encode_text(" hello", ranks, vocab) == [32, 259]
    # partial merges: "hell" stops at the rank-2 output
    assert bpe.encode_word(b"hell", ranks) == [b"hell"]
    # unmergeable word falls back to raw bytes
    assert bpe.encode_word(b"xyz", ranks) == [b"x", b"y", b"z"]


def test_round_trip_invariant_random_text():
    """decode(encode(t)) == t.encode() for ANY input — the invariant
    that proves pre-tokenization partitions the text exactly and the
    vocab covers every emittable token."""
    rng = random.Random(23)
    corpus_words = ["the", "quick", "brown", "fox", "it's", "1987", "#!?"]
    freqs = {}
    for w in corpus_words:
        for t in bpe.pretokenize(" " + w):
            freqs[t] = freqs.get(t, 0) + rng.randrange(1, 20)
    merges = bpe.train_bpe(freqs, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = bpe.vocab_from_merges(merges)
    samples = [
        "the quick brown fox",
        "it's 1987 #!? over the lazy dog",
        "",
        "  doubled  spaces\tand\nnewlines ",
        "unicode: café — 你好",
        "".join(rng.choice("abc #1'") for _ in range(200)),
    ]
    for t in samples:
        ids = bpe.encode_text(t, ranks, vocab)
        assert bpe.decode_ids(ids, merges) == t.encode("utf-8"), t


def test_parity_with_rank_order_reference():
    rng = random.Random(41)
    text = " ".join(
        rng.choice(["banana", "bandana", "ban", "anna", "nab", "it's"])
        for _ in range(300)
    )
    freqs = {}
    for t in bpe.pretokenize(text):
        freqs[t] = freqs.get(t, 0) + 1
    merges = bpe.train_bpe(freqs, 30)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in set(bpe.pretokenize(text)):
        assert bpe.encode_word(w, ranks) == _ref_encode_word(w, merges), w


def test_train_bpe_deterministic_and_greedy():
    # "ab" appears 5x, "ac" 3x: first merge must be (a, b)
    freqs = {b"ab": 5, b"ac": 3}
    merges = bpe.train_bpe(freqs, 2)
    assert merges[0] == (b"a", b"b")
    # tie at equal frequency breaks lexicographically
    freqs = {b"xy": 2, b"ab": 2}
    assert bpe.train_bpe(freqs, 1) == [(b"a", b"b")]
    # training stops when no pairs remain
    assert bpe.train_bpe({b"a": 10}, 5) == []


def test_spark_encode_matches_driver_and_feeds_packing(spark):
    rows = [
        (1, "the cat sat on the mat", "a"),
        (2, "the dog sat on the log", "a"),
        (3, None, "a"),
        (4, "cats and dogs", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    merges = bpe.train_bpe_sampled(docs, n_merges=30)
    # deterministic: a second fit returns the identical merge list
    assert merges == bpe.train_bpe_sampled(docs, n_merges=30)

    out = {r["doc_id"]: r for r in bpe.bpe_encode_text(docs, merges).collect()}
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = bpe.vocab_from_merges(merges)
    for i, t, _ in rows:
        if t is None:
            assert out[i]["token_ids"] is None and out[i]["n_tokens"] is None
        else:
            want = bpe.encode_text(t, ranks, vocab)
            assert out[i]["token_ids"] == want, i
            assert out[i]["n_tokens"] == len(want)
            assert bpe.decode_ids(out[i]["token_ids"], merges) == t.encode()

    # real token counts drive the packer
    from topn_clashroyal_etl_sql_snapshot_spark.operators.packing import pack_greedy

    encoded = bpe.bpe_encode_text(docs, merges).filter(F.col("n_tokens").isNotNull())
    packed = pack_greedy(
        encoded, ["source"], [F.asc("doc_id")], "n_tokens", budget=8
    )
    bins = {r["doc_id"]: r["bin_id"] for r in packed.collect()}
    n1 = out[1]["n_tokens"]
    n2 = out[2]["n_tokens"]
    assert bins[1] == 0 and bins[4] == 0
    assert bins[2] == (n1 // 8)  # doc 2 starts at doc 1's cumulative count


def test_train_sample_fuse_and_fraction(spark):
    docs = spark.createDataFrame(
        [(i, "w%d common text" % i) for i in range(50)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="refuses to collect"):
        bpe.train_bpe_sampled(docs, n_merges=5, max_docs=10)
    # a deterministic sub-sample fits under the bound and still trains
    merges = bpe.train_bpe_sampled(
        docs, n_merges=5, sample_fraction=0.15, max_docs=10
    )
    assert len(merges) == 5


def test_long_pretoken_fuse_round_trips(spark):
    """A single space-free machine-generated run (base64-ish blob) must
    not hit the O(L^2) merge loop whole: it is segmented at
    max_word_bytes, still decodes back to the exact utf-8 bytes, and
    ordinary words around it tokenize identically to the uncapped
    path."""
    blob = ("QmFzZTY0QQ==" * 700).replace("=", "A")  # 8400 chars, no spaces
    text = "prefix words " + blob + " suffix words"
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    ref = spark.createDataFrame(
        [(1, "prefix words and suffix words common text " * 5)],
        "doc_id long, text string",
    )
    merges = bpe.train_bpe_sampled(ref, n_merges=30)

    capped = bpe.bpe_encode_text(docs, merges, max_word_bytes=64).collect()[0]
    assert bpe.decode_ids(capped["token_ids"], merges) == text.encode()
    assert capped["n_tokens"] == len(capped["token_ids"])

    # words outside the blob are unaffected by the fuse
    plain = spark.createDataFrame(
        [(1, "prefix words suffix words")], "doc_id long, text string"
    )
    a = bpe.bpe_encode_text(plain, merges, max_word_bytes=64).collect()[0]
    b = bpe.bpe_encode_text(plain, merges).collect()[0]
    assert a["token_ids"] == b["token_ids"]
