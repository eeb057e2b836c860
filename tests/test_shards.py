"""Training-shard sink tests (sinks/shards.py): round-trip fidelity,
deterministic assignment vs the Python xxh64 twin, manifest integrity
(tamper detection on altered/lost/duplicated rows), worker-subset reads
with partition pruning, balance, and weight accounting."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from topn_clashroyal_etl_sql_snapshot_spark.sinks import shards
from topn_clashroyal_etl_sql_snapshot_spark.testing.xxh64 import spark_xxhash64


@pytest.fixture()
def tmp_out(tmp_path):
    out = str(tmp_path / "shards")
    yield out
    shutil.rmtree(out, ignore_errors=True)


def _docs(spark, n=200):
    rows = [(i, f"doc text {i} " * (1 + i % 5), 10 + i % 7) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string, n_tokens long")


def test_round_trip_and_assignment_matches_twin(spark, tmp_out):
    df = _docs(spark)
    shards.write_training_shards(df, tmp_out, "doc_id", 8, weight_col="n_tokens")
    back = shards.read_training_shards(spark, tmp_out)
    got = {r["doc_id"]: (r["text"], r["n_tokens"], r["shard_id"]) for r in back.collect()}
    assert len(got) == 200
    for r in df.collect():
        expect_shard = spark_xxhash64([("long", 42), ("long", r["doc_id"])]) % 8
        assert got[r["doc_id"]] == (r["text"], r["n_tokens"], expect_shard)


def test_manifest_counts_weights_and_verify_green(spark, tmp_out):
    df = _docs(spark)
    shards.write_training_shards(df, tmp_out, "doc_id", 4, weight_col="n_tokens")
    m = shards.read_manifest(spark, tmp_out).collect()
    assert sorted(r["shard_id"] for r in m) == sorted({r["shard_id"] for r in m})
    assert sum(r["n_rows"] for r in m) == 200
    assert sum(r["n_weight"] for r in m) == sum(
        r["n_tokens"] for r in df.collect()
    )
    rep = shards.verify_shards(spark, tmp_out, weight_col="n_tokens").collect()
    assert all(r["ok"] for r in rep) and len(rep) == len(m)


def test_two_writes_produce_identical_manifests(spark, tmp_path):
    df = _docs(spark, n=80)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    shards.write_training_shards(df, a, "doc_id", 5)
    # different row order in — same shards, same checksums out
    shards.write_training_shards(df.orderBy(F.desc("doc_id")), b, "doc_id", 5)
    ma = sorted(map(tuple, shards.read_manifest(spark, a).collect()))
    mb = sorted(map(tuple, shards.read_manifest(spark, b).collect()))
    assert ma == mb


def test_tampered_shard_detected(spark, tmp_out):
    df = _docs(spark, n=100)
    shards.write_training_shards(df, tmp_out, "doc_id", 4, weight_col="n_tokens")
    # tamper: rewrite one shard directory with one text altered
    # materialize first: Spark refuses to overwrite a path it is reading
    rows = (
        shards.read_training_shards(spark, tmp_out)
        .filter(F.col("shard_id") == 1)
        .drop("shard_id")
        .collect()
    )
    doomed = rows[0]["doc_id"]
    tampered = [
        (r["doc_id"], "TAMPERED" if r["doc_id"] == doomed else r["text"], r["n_tokens"])
        for r in rows
    ]
    spark.createDataFrame(
        tampered, "doc_id long, text string, n_tokens long"
    ).write.mode("overwrite").parquet(f"{tmp_out}/shard_id=1")
    rep = {
        r["shard_id"]: r["ok"]
        for r in shards.verify_shards(spark, tmp_out, weight_col="n_tokens").collect()
    }
    assert rep[1] is False
    assert all(ok for s, ok in rep.items() if s != 1)


def test_lost_rows_detected(spark, tmp_out):
    df = _docs(spark, n=100)
    shards.write_training_shards(df, tmp_out, "doc_id", 4)
    rows = (
        shards.read_training_shards(spark, tmp_out)
        .filter(F.col("shard_id") == 2)
        .drop("shard_id")
        .collect()
    )
    kept = [
        (r["doc_id"], r["text"], r["n_tokens"]) for r in rows[1:]
    ]
    spark.createDataFrame(
        kept, "doc_id long, text string, n_tokens long"
    ).write.mode("overwrite").parquet(f"{tmp_out}/shard_id=2")
    rep = {
        r["shard_id"]: (r["ok"], r["stored_rows"], r["actual_rows"])
        for r in shards.verify_shards(spark, tmp_out).collect()
    }
    ok, stored, actual = rep[2]
    assert ok is False and actual == stored - 1


def test_worker_subset_read_prunes_partitions(spark, tmp_out):
    df = _docs(spark, n=120)
    shards.write_training_shards(df, tmp_out, "doc_id", 6)
    sub = shards.read_training_shards(spark, tmp_out, shard_ids=[0, 3])
    assert set(r["shard_id"] for r in sub.collect()) <= {0, 3}
    plan = sub._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not run as a post-filter
    assert "PartitionFilters: [" in plan
    assert "shard_id" in plan.split("PartitionFilters")[1][:200]


def test_balance_is_hash_uniform(spark, tmp_out):
    df = _docs(spark, n=2000)
    shards.write_training_shards(df, tmp_out, "doc_id", 4)
    m = {r["shard_id"]: r["n_rows"] for r in shards.read_manifest(spark, tmp_out).collect()}
    assert len(m) == 4
    assert max(m.values()) <= 1.2 * min(m.values())


def test_bad_params(spark):
    df = _docs(spark, n=3)
    with pytest.raises(ValueError):
        shards.shard_expr("doc_id", 0)
    with pytest.raises(ValueError):
        shards.shard_manifest(df.select(F.lit(0).alias("shard_id")))


def test_small_files_guard(spark, tmp_out):
    """The 100 TB metadata contract: with the default shard-keyed
    repartition, each shard directory holds ONE parquet file no matter
    how many upstream tasks fed the write (a raw partitionBy would emit
    tasks × shards files); records_per_file re-splits a shard into
    bounded files WITHIN its directory; coalesce_shards=False restores
    the raw behavior (many files per dir from a many-partition input).
    Rows are identical in all three regimes."""
    from pathlib import Path

    def files_per_shard(root):
        out = {}
        for d in Path(root).glob("shard_id=*"):
            out[d.name] = len(list(d.glob("*.parquet")))
        return out

    df = _docs(spark, n=400).repartition(16)  # many upstream tasks
    shards.write_training_shards(df, tmp_out, "doc_id", 4)
    fps = files_per_shard(tmp_out)
    assert len(fps) == 4 and set(fps.values()) == {1}, fps
    want = sorted(r["doc_id"] for r in df.collect())
    assert sorted(
        r["doc_id"]
        for r in shards.read_training_shards(spark, tmp_out).collect()
    ) == want

    shards.write_training_shards(
        df, tmp_out, "doc_id", 4, records_per_file=25
    )
    fps = files_per_shard(tmp_out)
    # ~100 rows/shard at 25 rows/file -> >=4 bounded files per dir
    assert all(v >= 3 for v in fps.values()), fps
    assert sorted(
        r["doc_id"]
        for r in shards.read_training_shards(spark, tmp_out).collect()
    ) == want

    shards.write_training_shards(
        df, tmp_out, "doc_id", 4, coalesce_shards=False
    )
    fps = files_per_shard(tmp_out)
    assert max(fps.values()) > 1, fps  # the pre-guard behavior
    assert sorted(
        r["doc_id"]
        for r in shards.read_training_shards(spark, tmp_out).collect()
    ) == want


def test_shards_guards_and_atomic_r11(spark, tmp_path):
    """r11 review hardening: empty input refused at write time; an
    existing shard_col column refused (silent data loss otherwise);
    custom shard_col threads through read/verify; weight_col is
    recorded in the manifest so a bare verify uses the right
    semantics; all-NULL weights verify ok (NULL-safe equality); the
    atomic writer preserves the previous generation through a failed
    write."""
    import pytest

    from topn_clashroyal_etl_sql_snapshot_spark.sinks import shards as sh

    df = spark.createDataFrame(
        [(i, f"text {i}", (None if i % 2 else i * 10)) for i in range(40)],
        "doc_id long, text string, n_tokens long",
    )

    with pytest.raises(ValueError, match="empty shard set"):
        sh.write_training_shards(
            df.filter("doc_id < 0"), str(tmp_path / "e"), "doc_id", 4
        )
    with pytest.raises(ValueError, match="must be explicit"):
        sh.with_shard(df.withColumn("shard_id", F.lit(1)), "doc_id", 4)

    # custom shard_col end-to-end, weight recorded + auto-verified
    p = str(tmp_path / "custom")
    sh.write_training_shards(
        df, p, "doc_id", 4, weight_col="n_tokens", shard_col="bucket"
    )
    back = sh.read_training_shards(spark, p, shard_ids=[0], shard_col="bucket")
    assert back.count() > 0 and "bucket" in back.columns
    rep = sh.verify_shards(spark, p, shard_col="bucket")  # weight_col=auto
    assert all(r["ok"] for r in rep.collect())
    # explicit wrong weight column WOULD alarm — proving auto matters
    rep_wrong = sh.verify_shards(spark, p, weight_col=None, shard_col="bucket")
    assert not all(r["ok"] for r in rep_wrong.collect())

    # all-NULL weight column: intact data must verify ok
    dfn = spark.createDataFrame(
        [(i, f"t{i}", None) for i in range(12)],
        "doc_id long, text string, w long",
    )
    pn = str(tmp_path / "nullw")
    sh.write_training_shards(dfn, pn, "doc_id", 2, weight_col="w")
    assert all(r["ok"] for r in sh.verify_shards(spark, pn).collect())

    # atomic: good write serves; a failing second write leaves it intact
    pa = str(tmp_path / "atomic")
    sh.write_training_shards_atomic(df, pa, "doc_id", 4, weight_col="n_tokens")
    v1 = sh.read_training_shards(spark, pa).count()
    assert v1 == 40
    with pytest.raises(ValueError, match="empty shard set"):
        sh.write_training_shards_atomic(
            df.filter("doc_id < 0"), pa, "doc_id", 4
        )
    assert sh.read_training_shards(spark, pa).count() == 40  # old gen intact
    assert all(r["ok"] for r in sh.verify_shards(spark, pa).collect())


def test_verify_r12_manifest_compat_and_auto_sentinel(spark, tmp_path):
    """r11 advisor findings: a pre-r11 manifest (no weight_col column,
    old checksum format) raises a rewrite instruction instead of
    crashing or reporting intact shards as corrupted; the auto-weight
    sentinel is a non-string object, so a payload column literally
    named 'auto' is treated as a column name, never as the sentinel."""
    df = spark.createDataFrame(
        [(i, f"t{i}", i + 1) for i in range(30)],
        "doc_id long, text string, auto long",
    )
    p = str(tmp_path / "autocol")
    shards.write_training_shards(df, p, "doc_id", 3, weight_col="auto")
    # default (sentinel) reads the recorded name; the string "auto"
    # names the COLUMN — both verify green on intact data
    assert all(r["ok"] for r in shards.verify_shards(spark, p).collect())
    rep = shards.verify_shards(spark, p, weight_col="auto").collect()
    assert all(r["ok"] for r in rep)
    assert {r["stored_weight"] for r in rep} != {r["stored_rows"] for r in rep}

    # simulate a pre-r11 manifest: drop weight_col from the stored one
    import os

    mpath = os.path.join(p, shards.MANIFEST_DIR)
    old = spark.read.parquet(mpath).drop("weight_col")
    old_rows, old_schema = old.collect(), old.schema
    spark.createDataFrame(old_rows, old_schema).write.mode(
        "overwrite"
    ).parquet(mpath)
    with pytest.raises(ValueError, match="predates the current format"):
        shards.verify_shards(spark, p)

    # r13 (advisor finding): the manifest-only migration path — restate
    # the write-time weight semantics, re-stamp _manifest in place
    # (payload untouched), and verification works again
    shards.upgrade_manifest(spark, p, weight_col="auto")
    rep2 = shards.verify_shards(spark, p).collect()
    assert all(r["ok"] for r in rep2)
    # the payload data files were not rewritten — weights preserved
    assert {r["stored_weight"] for r in rep2} != {r["stored_rows"] for r in rep2}
    # already-current manifests refuse (nothing to migrate)
    with pytest.raises(ValueError, match="already in the current format"):
        shards.upgrade_manifest(spark, p, weight_col="auto")


def test_upgrade_manifest_refuses_untrustworthy_payload(spark, tmp_path):
    """upgrade_manifest must NOT re-stamp over real damage: with rows
    missing from the payload (or the wrong weight semantics restated),
    the format-independent row/weight cross-check fails loudly and the
    old manifest stays in place."""
    import glob
    import os

    df = spark.createDataFrame(
        [(i, f"t{i}", i + 1) for i in range(30)],
        "doc_id long, text string, w long",
    )
    p = str(tmp_path / "damaged")
    shards.write_training_shards(df, p, "doc_id", 3, weight_col="w")
    mpath = os.path.join(p, shards.MANIFEST_DIR)
    old = spark.read.parquet(mpath).drop("weight_col")
    rows, schema = old.collect(), old.schema
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(mpath)

    # wrong weight semantics: the stored n_weight came from column w
    with pytest.raises(ValueError, match="cannot be trusted"):
        shards.upgrade_manifest(spark, p)  # weight_col=None ≠ write-time

    # lost data: drop one shard's parquet files entirely
    victim = glob.glob(os.path.join(p, "shard_id=0", "*.parquet"))
    assert victim
    for f in victim:
        os.remove(f)
    with pytest.raises(ValueError, match="cannot be trusted"):
        shards.upgrade_manifest(spark, p, weight_col="w")
    # the old manifest is still there, un-restamped
    assert "weight_col" not in spark.read.parquet(mpath).columns
