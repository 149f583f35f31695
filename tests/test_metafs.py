"""Control-plane FS contract (VERDICT r4 next-#3): every metadata byte
— snapshots, file-list sidecars, the version CAS — moves through the
MetaFS seam, so an object-store metadata backend is one subclass away.
The FakeRemoteMetaFS proves the seam is tight: a full ingest + fold +
read + maintenance cycle must leave ZERO metadata on the local
filesystem while staying state-identical to a local-FS twin."""

from __future__ import annotations

import os

import pytest

from dlt_spark.functions.normalize import normalize_events
from dlt_spark.lakehouse import LakehouseTable, SnapshotConflict
from dlt_spark.metafs import FakeRemoteMetaFS, LocalMetaFS
from dlt_spark.operators.dedup import dedup_lww
from dlt_spark.sources.generator import generate_change_log


def _updates(spark, lo, hi, seed=5):
    n = hi - lo + 1
    ev = generate_change_log(spark, n, n_keys=max(20, n // 5), seed=seed)
    from pyspark.sql import functions as F

    ev = ev.withColumn("commit_seq", F.col("commit_seq") + lo - 1)
    return dedup_lww(normalize_events(ev))


def _state(t):
    return sorted(
        (r["doc_id"], r["_commit_seq"])
        for r in t.read().select("doc_id", "_commit_seq").collect()
    )


def test_fake_remote_metafs_full_cycle_no_local_metadata(spark, tmp_path):
    """Ingest enough batches to trigger an L0→L1 fold, then compact,
    history, changes_between, expire, time-travel — all against the
    in-process object store.  The local table root must contain ONLY
    the data plane (parquet); every snapshot/sidecar JSON lives in the
    fake store."""
    fs = FakeRemoteMetaFS()
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=8, meta_fs=fs)
    # twin on the local FS for state equivalence
    lpath = str(tmp_path / "l")
    lt = LakehouseTable.create(spark, lpath, n_buckets=8)

    for b in range(9):  # > max_deltas=8 → exercises the fold path
        lo, hi = b * 200, b * 200 + 199
        t.merge(_updates(spark, lo + 1, hi + 1, seed=b), "job", b, lo, hi)
        lt.merge(_updates(spark, lo + 1, hi + 1, seed=b), "job", b, lo, hi)

    assert _state(t) == _state(lt)
    assert t.watermark() == lt.watermark()

    # reload through the fake store (metadata round-trip)
    t2 = LakehouseTable.load(spark, path, meta_fs=fs)
    assert _state(t2) == _state(lt)

    # maintenance cycle
    t2.compact()
    assert _state(t2) == _state(lt)
    hist = t2.history()
    assert [h["version"] for h in hist] == list(range(0, t2.version + 1))
    ch = t2.changes_between(0, 3)
    assert ch.count() > 0
    old_state = _state(LakehouseTable.load(spark, path, version=3, meta_fs=fs))
    assert old_state  # time travel works off the fake store
    expired = t2.expire_snapshots(retain_last=2)
    assert expired["snapshots_expired"] > 0
    with pytest.raises(FileNotFoundError):
        LakehouseTable.load(spark, path, version=1, meta_fs=fs)

    # THE CONTRACT: zero metadata on the local filesystem — the local
    # root holds only data-plane parquet
    assert not os.path.exists(os.path.join(path, "_snapshots"))
    assert not os.path.exists(os.path.join(path, "_filelists"))
    for dirpath, _dirs, files in os.walk(path):
        for fn in files:
            assert not fn.endswith(".json"), f"local metadata leak: {fn}"
    # and the fake store DOES hold the snapshots + sidecars
    cas_ops = [p for op, p in fs.ops if op == "cas"]
    assert any("_snapshots" in p for p in cas_ops)
    assert any("_filelists" in p for op, p in fs.ops if op == "write")


def test_fake_remote_cas_detects_conflict(spark, tmp_path):
    """The snapshot version CAS holds on the fake store: two handles at
    the same version — the second publisher must see SnapshotConflict
    (commit_delta's retry path then re-reads and lands at v+2)."""
    fs = FakeRemoteMetaFS()
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=4, meta_fs=fs)
    t.merge(_updates(spark, 1, 100), "job", 0)
    a = LakehouseTable.load(spark, path, meta_fs=fs)
    b = LakehouseTable.load(spark, path, meta_fs=fs)
    a.merge(_updates(spark, 101, 200), "j2", 0, 100, 199)
    # b still believes version v; its direct publish must conflict
    with pytest.raises(SnapshotConflict):
        b.commit_delta(
            b.prepare_delta(_updates(spark, 201, 300), "j3", 0),
            "j3", 0, seq_from=200, seq_to=299, conflict_retries=0,
        )
    # with retries the same commit lands cleanly
    b._snap = b.refresh()._snap
    b.commit_delta(
        b.prepare_delta(_updates(spark, 201, 300), "j3", 0),
        "j3", 0, seq_from=200, seq_to=299,
    )
    assert LakehouseTable.load(spark, path, meta_fs=fs).watermark() == 299


def test_local_metafs_is_default_and_identical(spark, tmp_path):
    """Default tables keep the exact on-disk layout (snapshots under
    _snapshots/, hard-link CAS) — LocalMetaFS is the old inline code."""
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=4)
    assert isinstance(t.fs, LocalMetaFS)
    t.merge(_updates(spark, 1, 50), "job", 0)
    assert os.path.exists(
        os.path.join(path, "_snapshots", f"v{1:012d}.json")
    )
