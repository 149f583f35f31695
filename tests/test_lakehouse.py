"""Lakehouse-level tests: optimistic-concurrency conflict, compaction
invariants, vacuum safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dlt_spark.lakehouse import LakehouseTable
from dlt_spark.operators.dedup import dedup_lww
from dlt_spark.schemas import CHANGE_EVENT_SCHEMA
from dlt_spark.sources.generator import generate_change_log


def _updates(spark, lo, hi, seed=5):
    df = generate_change_log(spark, 2_000, n_keys=200, seed=seed).where(
        F.col("commit_seq").between(lo, hi)
    )
    from dlt_spark.functions.normalize import normalize_events

    return dedup_lww(normalize_events(df), with_counts=True)


def test_concurrent_commit_conflict(spark, tmp_path):
    """Two writers race the same snapshot version: exactly one wins the
    create-exclusive publish; with retries disabled the loser gets the
    conflict error and can refresh+retry by hand."""
    path = str(tmp_path / "t")
    a = LakehouseTable.create(spark, path, n_buckets=8)
    b = LakehouseTable.load(spark, path)  # second handle, same version

    pa = a.prepare_delta(_updates(spark, 0, 499), "jobA", 0)
    pb = b.prepare_delta(_updates(spark, 500, 999), "jobB", 0)

    a.commit_delta(pa, "jobA", 0, 0, 499)
    with pytest.raises(RuntimeError, match="snapshot conflict"):
        b.commit_delta(pb, "jobB", 0, 500, 999, conflict_retries=0)

    # loser refreshes and retries — both commits land, no data lost
    b = b.refresh()
    b.commit_delta(pb, "jobB", 0, 500, 999)
    t = LakehouseTable.load(spark, path)
    assert t.version == 2
    assert t.is_applied("jobA", 0) and t.is_applied("jobB", 0)


def test_concurrent_commit_auto_retry(spark, tmp_path):
    """Default commit_delta retries a snapshot conflict hands-free: two
    stale handles commit concurrently-prepared deltas; both land exactly
    once with no manual refresh (VERDICT r1 next-#9)."""
    path = str(tmp_path / "t")
    a = LakehouseTable.create(spark, path, n_buckets=8)
    b = LakehouseTable.load(spark, path)  # stale second handle

    pa = a.prepare_delta(_updates(spark, 0, 499), "jobA", 0)
    pb = b.prepare_delta(_updates(spark, 500, 999), "jobB", 0)

    a.commit_delta(pa, "jobA", 0, 0, 499)
    b.commit_delta(pb, "jobB", 0, 500, 999)  # conflicts once, retries

    t = LakehouseTable.load(spark, path)
    assert t.version == 2
    assert t.is_applied("jobA", 0) and t.is_applied("jobB", 0)
    # replay of either batch is a no-op (exactly-once survives the race)
    m = t.merge(_updates(spark, 500, 999), "jobB", 0)
    assert t.version == 2 and m["events_applied"] > 0


def test_tiered_read_plan_no_base_shuffle(spark, tmp_path):
    """VERDICT r1 next-#1: with a materialized base and pending deltas,
    read() must not shuffle the base — tier 1 broadcasts the resolved
    delta onto a streamed base scan (BroadcastHashJoin only; the only
    exchanges are the O(pending) resolve), plus a doc_id-pruned base
    probe for insert detection.  Result must equal the full resolve."""
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=8, max_deltas=8)
    t.merge(_updates(spark, 0, 999), "j", 0, 0, 999)
    t.compact()  # base materialized
    t.merge(_updates(spark, 1000, 1499), "j", 1, 1000, 1499)
    t.merge(_updates(spark, 1500, 1999), "j", 2, 1500, 1999)
    assert len(t._snap["deltas"]) == 2 and t._snap["buckets"]
    assert t._snap["base_rows"] and t._snap["base_rows"] > 0

    df = t.read(tier=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 3  # merge + semi + anti
    # insert-detection probe is column-pruned to the key
    assert "ReadSchema: struct<doc_id:string>" in plan
    # exchanges = the pending-resolve subtrees only (3 instantiations)
    assert plan.count("Exchange hashpartitioning") <= 3

    # value parity with the unconditional full resolve (tier 3)
    pend_files, pend_rows = t._pending()
    assert pend_rows is not None and pend_rows > 0
    base_files = [p for ps in t._snap["buckets"].values() for p in ps]
    full = t._resolve(t._raw(t._abs(base_files + pend_files))).where("NOT _deleted")
    a = {tuple(r) for r in df.select("doc_id", "_commit_seq").collect()}
    b = {tuple(r) for r in full.select("doc_id", "_commit_seq").collect()}
    assert a == b and a
    # tier 2 (key-set broadcast, anti/semi split) agrees too
    c = {
        tuple(r)
        for r in t.read(tier=2).select("doc_id", "_commit_seq").collect()
    }
    assert c == b
    # cost model: base ≈ pending here, so the DEFAULT choice is the
    # plain resolve (merge tiers only pay off when base ≫ pending)
    dplan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in dplan


def test_compaction_preserves_state_and_prunes_files(spark, tmp_path):
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=8, max_deltas=100)
    for i in range(3):
        u = _updates(spark, i * 600, i * 600 + 599)
        t.merge(u, "j", i, i * 600, i * 600 + 599)
    before = t.read(include_deleted=True).orderBy("doc_id").collect()
    assert t._snap["deltas"]  # uncompacted
    t.compact()
    assert not t._snap["deltas"]
    after = t.read(include_deleted=True).orderBy("doc_id").collect()
    assert before == after
    assert t.vacuum() == 0  # grace window protects young files (ADVICE.md)
    # superseded delta files are NOT orphans: older retained snapshots
    # still reference them, so vacuum leaves them (time travel stays
    # valid) and expire_snapshots — pure metadata diff — reclaims them
    assert t.vacuum(grace_secs=0) == 0
    stats = t.expire_snapshots(retain_last=1)
    assert stats["files_removed"] > 0 and stats["snapshots_expired"] > 0
    assert t.read(include_deleted=True).orderBy("doc_id").collect() == after


def test_time_travel_history_and_changes(spark, tmp_path):
    """Iceberg-parity metadata surface: VERSION AS OF reads, history(),
    and the incremental change feed between snapshots (CDC-out)."""
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=8, max_deltas=100)
    t.merge(_updates(spark, 0, 499), "j", 0, 0, 499)
    v1 = t.version
    rows_v1 = t.read().count()
    t.merge(_updates(spark, 500, 999), "j", 1, 500, 999)
    t.merge(_updates(spark, 1000, 1499), "j", 2, 1000, 1499)
    v3 = t.version

    # time travel: the v1 handle still reads exactly the v1 state
    old = LakehouseTable.load(spark, path, version=v1)
    assert old.version == v1 and old.read().count() == rows_v1
    assert LakehouseTable.load(spark, path).read().count() >= rows_v1
    import pytest as _pt
    with _pt.raises(FileNotFoundError, match="snapshot v999"):
        LakehouseTable.load(spark, path, version=999)

    # history: one row per retained snapshot, versions ascending
    h = t.history()
    assert [r["version"] for r in h] == list(range(0, v3 + 1))
    assert h[-1]["batch_id"] == 2
    # limit selects the NEWEST N; a negative limit is an error, not a
    # silent drop of the |N| oldest (ADVICE r5)
    assert [r["version"] for r in t.history(limit=2)] == [v3 - 1, v3]
    with _pt.raises(ValueError, match="history limit"):
        t.history(limit=-1)
    # a prepared dict carrying both marker mutations is rejected
    # loudly instead of mis-merged (ADVICE r5)
    with _pt.raises(ValueError, match="mutually exclusive"):
        t.commit_delta(
            {"files": [], "stats": None, "has_counts": False, "extras": [],
             "markers_delta": {"files": ["x"], "rows": 1},
             "clear_markers": ["y"]},
            "j", 99,
        )

    # incremental feed v1 -> v3 = exactly batches 1 and 2's raw rows
    ch = t.changes_between(v1, v3)
    m1 = t._find_manifest("j", 1)
    m2 = t._find_manifest("j", 2)
    assert ch.count() == m1["events_applied"] + m2["events_applied"]
    seqs = ch.agg(F.min("_commit_seq"), F.max("_commit_seq")).collect()[0]
    assert seqs[0] >= 500 and seqs[1] <= 1499
    assert "_deleted" in ch.columns  # tombstones ride the feed

    # window closes after compaction + snapshot expiry
    t.compact()
    t.expire_snapshots(retain_last=1)
    with _pt.raises(FileNotFoundError, match="incremental window closed"):
        t.changes_between(v1, v3).count()
    # expired version is gone with a CLEAR error, not a mid-scan
    # parquet FileNotFound (ADVICE.md: expiry couples file removal
    # with snapshot removal)
    with _pt.raises(FileNotFoundError, match=f"snapshot v{v1}"):
        LakehouseTable.load(spark, path, version=v1)


def test_expire_snapshots_never_lists_data_dir(spark, tmp_path, monkeypatch):
    """The scale contract for maintenance (VERDICT r2 #4): reclaiming
    superseded files is a snapshot-metadata diff — no os.walk/listdir of
    the data directory (object-store safe)."""
    import os as _os
    import dlt_spark.lakehouse as lh

    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=8, max_deltas=100)
    for i in range(3):
        t.merge(_updates(spark, i * 600, i * 600 + 599), "j", i, i * 600, i * 600 + 599)
    t.compact()
    before = t.read().count()

    data_top = _os.path.join(path, "data")
    real_walk, real_listdir = _os.walk, _os.listdir

    def guarded_walk(top, *a, **k):
        assert not str(top).startswith(data_top), "expire listed the data dir"
        return real_walk(top, *a, **k)

    def guarded_listdir(p):
        assert not str(p).startswith(data_top), "expire listed the data dir"
        return real_listdir(p)

    monkeypatch.setattr(lh.os, "walk", guarded_walk)
    monkeypatch.setattr(lh.os, "listdir", guarded_listdir)
    stats = t.expire_snapshots(retain_last=1)
    assert stats["files_removed"] > 0
    monkeypatch.undo()
    assert t.read().count() == before
    # time travel to retained (latest) version still works
    assert LakehouseTable.load(spark, path, version=t.version).read().count() == before


def test_forced_reapply_of_spilled_manifest_supersedes(spark, tmp_path, monkeypatch):
    """ADVICE.md (medium): a forced re-apply of a batch whose manifest
    row already spilled to an immutable parquet sidecar must not leave a
    duplicate (job_id, batch_id) row — the stale spilled row is recorded
    as superseded and filtered out of manifests_df()/changes_between()."""
    import dlt_spark.lakehouse as lh

    monkeypatch.setattr(lh, "MANIFEST_TAIL", 3)  # spill after >6 rows
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=4, max_deltas=100)
    for i in range(8):
        t.merge(_updates(spark, i * 200, i * 200 + 199), "j", i, i * 200, i * 200 + 199)
    assert t._snap["manifest_spill"], "precondition: spill happened"
    assert not any(
        m["job_id"] == "j" and m["batch_id"] == 0 for m in t._snap["manifests"]
    ), "precondition: batch 0's row lives only in the sidecar"

    old_row = t._find_manifest("j", 0)
    m = t.merge(_updates(spark, 0, 199), "j", 0, 0, 199, force=True)
    rows = [
        r
        for r in t.manifests_df().collect()
        if r["job_id"] == "j" and r["batch_id"] == 0
    ]
    assert len(rows) == 1, f"duplicate manifest rows after force: {rows}"
    assert rows[0]["snapshot_version"] == m["snapshot_version"] > old_row["snapshot_version"]
    # _find_manifest resolves to the replacement, not the stale row
    assert t._find_manifest("j", 0)["snapshot_version"] == m["snapshot_version"]
    # the supersession survives reload
    t2 = LakehouseTable.load(spark, path)
    assert t2._find_manifest("j", 0)["snapshot_version"] == m["snapshot_version"]


def test_tier1_broadcast_cap_enforced(spark, tmp_path, monkeypatch):
    """ADVICE.md: an explicit tier=1 read above BROADCAST_ROWS_T1 must
    degrade to the key-broadcast tier instead of broadcasting unbounded
    full rows."""
    import dlt_spark.lakehouse as lh

    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=4, max_deltas=100)
    t.merge(_updates(spark, 0, 999), "j", 0, 0, 999)
    t.compact()
    t.merge(_updates(spark, 1000, 1099, seed=7), "j", 1, 1000, 1099)
    expected = {
        tuple(r) for r in t.read(tier=3).select("doc_id", "_commit_seq").collect()
    }
    monkeypatch.setattr(lh, "BROADCAST_ROWS_T1", 0)
    got = {
        tuple(r) for r in t.read(tier=1).select("doc_id", "_commit_seq").collect()
    }
    assert got == expected


def test_scan_raw_lww_fold_equals_read(spark, tmp_path):
    """scan_raw returns the UNRESOLVED multiset (every stored version);
    folding it through the same LWW rule must reproduce read() exactly —
    the equivalence the resolve-free cascade lookup and any other
    LWW-idempotent consumer lean on.  Checked with pending deltas
    present (multiple versions per key across base/L1/L0), full table
    and bucket-pruned."""
    from dlt_spark.lakehouse import LakehouseTable
    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.sources.changelog import write_change_log
    from dlt_spark.sources.generator import generate_change_log

    log = str(tmp_path / "log")
    tbl = str(tmp_path / "tbl")
    write_change_log(
        generate_change_log(spark, 6_000, n_keys=400, seed=11),
        log, part_width=1_000,
    )
    run_incremental(spark, log, tbl, batch_width=1_000, n_buckets=8,
                    log_part_width=1_000)
    t = LakehouseTable.load(spark, tbl)
    assert t._snap["deltas"], "need pending L0 for a meaningful check"

    def key(df):
        return sorted(
            (r["doc_id"], r["_commit_seq"], tuple(r["tokens"] or []))
            for r in df.collect()
        )

    for buckets in (None, [1, 5]):
        raw = t.scan_raw(buckets=buckets)
        folded = t._resolve(raw).where("NOT _deleted")
        assert key(folded) == key(t.read(buckets=buckets))
    # raw really is a multiset: more rows than resolved keys
    assert t.scan_raw().count() > t.read(include_deleted=True).count()


def test_read_pins_one_snapshot_across_concurrent_fold(spark, tmp_path):
    """ADVICE r3 (high): read()/scan_raw() used to dereference
    self._snap several times (buckets, then l1/deltas via _pending);
    a fold/compaction commit swapping the snapshot between those reads
    produced a torn view — base files from the OLD snap, deltas from
    the NEW (already-folded, empty) one — silently dropping every row
    that had been pending.  Simulate exactly that interleaving with a
    snapshot sequence that advances on every attribute access: the
    pinned read must return the complete pre-fold state."""
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=8)
    t.merge(_updates(spark, 0, 499), "job", 0)
    t.merge(_updates(spark, 500, 999), "job", 1)
    stale = LakehouseTable.load(spark, path)
    old_snap = stale._snap
    assert old_snap["deltas"], "need pending L0 for the race to matter"
    expected = sorted(
        (r["doc_id"], r["_commit_seq"])
        for r in stale.read().select("doc_id", "_commit_seq").collect()
    )

    folder = LakehouseTable.load(spark, path)
    folder.compact()  # moves all pending → base, swaps the snapshot
    new_snap = folder._snap
    assert not new_snap["deltas"] and not new_snap.get("l1")

    class TornSnap(LakehouseTable):
        # property shadows the instance attribute: each access returns
        # the next snapshot in the scripted sequence (old, then new —
        # i.e. the fold lands right after the first dereference)
        @property
        def _snap(self):
            i = min(self._snap_i, len(self._snap_seq) - 1)
            self._snap_i += 1
            return self._snap_seq[i]

        @_snap.setter
        def _snap(self, v):  # pragma: no cover - load() assigns it
            pass

    stale.__class__ = TornSnap
    stale._snap_seq = [old_snap, new_snap]

    for method in ("read", "scan_raw"):
        stale._snap_i = 0
        df = getattr(stale, method)()
        if method == "scan_raw":
            df = stale._resolve(df).where("NOT _deleted")
        got = sorted(
            (r["doc_id"], r["_commit_seq"])
            for r in df.select("doc_id", "_commit_seq").collect()
        )
        assert got == expected, f"{method} tore across the fold"
        assert stale._snap_i > 1, "sequence never advanced - test inert"


def test_compact_pins_one_snapshot_vs_concurrent_fold(spark, tmp_path):
    """VERDICT r4 #4: compact() used to dereference self._snap twice
    (_pending, then buckets/version) — a concurrent commit swapping the
    snapshot in between could fold a MIX of two snapshots and publish
    it as if nothing happened.  With the snapshot pinned once, the same
    interleaving must surface as a SnapshotConflict at publish (the
    version CAS), never as a silently-torn base."""
    from dlt_spark.lakehouse import SnapshotConflict

    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=8)
    t.merge(_updates(spark, 0, 499), "job", 0)
    t.merge(_updates(spark, 500, 999), "job", 1)
    stale = LakehouseTable.load(spark, path)
    old_snap = stale._snap
    assert old_snap["deltas"], "need pending L0 for the race to matter"

    folder = LakehouseTable.load(spark, path)
    folder.compact()  # the concurrent fold: publishes version v+1
    new_snap = folder._snap

    class TornSnap(LakehouseTable):
        @property
        def _snap(self):
            i = min(self._snap_i, len(self._snap_seq) - 1)
            self._snap_i += 1
            return self._snap_seq[i]

        @_snap.setter
        def _snap(self, v):  # pragma: no cover
            pass

    stale.__class__ = TornSnap
    stale._snap_seq = [old_snap, new_snap]
    stale._snap_i = 0
    # pinned compact works entirely off old_snap and tries to publish
    # old_version+1 — already taken by the concurrent fold → conflict.
    # (The un-pinned code read the NEW version on its later dereference
    # and published v+2 with no error.)
    with pytest.raises(SnapshotConflict):
        stale.compact()


def test_manifest_spill_version_index_prunes_files(spark, tmp_path):
    """VERDICT r4 next-#6: each manifest spill sidecar records its
    [v_min, v_max] snapshot-version range, and a changes_between window
    seek opens ONLY the sidecars intersecting the window — O(window)
    driver metadata on a 10^4-commit table, not O(commits).  Synthesize
    10_000 commits' manifests through the real spill machinery and
    assert the windowed scan's input files collapse."""
    import os as _os

    t = LakehouseTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    # one real delta file every manifest can reference
    t.merge(_updates(spark, 0, 49), "seed", 0)
    delta_files = t._snap["deltas"][0]["files"]

    def mk(v):
        return {
            "job_id": "job", "batch_id": v, "seq_from": v * 10,
            "seq_to": v * 10 + 9, "events_read": 10, "events_applied": 10,
            "deletes_applied": 0, "min_doc_id": "a", "max_doc_id": "z",
            "committed_at": "2026-08-17T00:00:00+00:00",
            "snapshot_version": v, "data_hash": v,
            "delta_files": list(delta_files),
        }

    # feed 10_000 manifests through the real spill path in commit-order
    tail, spill = [], list(t._snap["manifest_spill"])
    for v in range(1, 10_001):
        tail.append(mk(v))
        t._snap["manifest_spill"] = spill
        tail, spill = t._spill_manifests(tail)
    t._snap["manifests"] = tail
    t._snap["manifest_spill"] = spill

    assert len(spill) > 100  # ~150 sidecars at tail=64
    assert all(e["v_min"] <= e["v_max"] for e in spill)

    all_files = set(t.manifests_df().inputFiles())
    win_files = set(t.manifests_df(9_900, 10_000).inputFiles())
    assert len(all_files) > 100
    assert len(win_files) <= 3, f"window opened {len(win_files)} sidecars"

    # the windowed feed itself is correct: exactly the window's commits
    ch = t.changes_between(9_990, 10_000)
    assert ch.count() == 10 * t._snap["deltas"][0]["rows"]

    # legacy (un-indexed) entries are still read — no silent row loss
    t._snap["manifest_spill"] = [
        {"path": e["path"], "v_min": None, "v_max": None} for e in spill
    ]
    assert set(t.manifests_df(9_900, 10_000).inputFiles()) == all_files


def test_fold_pending_state_equivalent_and_bounded(spark, tmp_path):
    """Round-6 overlapped fold: fold_pending() is the commit-path
    L0→L1 fold as a standalone maintenance commit — state before ==
    state after, L0 empties into L1, re-fold is a no-op, and lineage
    (watermark, manifests, applied ranges) is untouched."""
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=8)
    for b in range(4):
        t.merge(_updates(spark, b * 500, b * 500 + 499), "job", b)
    t = t.refresh()
    assert len(t._snap["deltas"]) == 4
    before = sorted(
        tuple(r) for r in t.read().select("doc_id", "_commit_seq").collect()
    )
    wm, n_manifests = t.watermark(), len(t._snap["manifests"])

    assert t.fold_pending() == 4
    assert t._snap["deltas"] == []
    assert any(e["files"] for e in t._snap["l1"].values())
    after = sorted(
        tuple(r) for r in t.read().select("doc_id", "_commit_seq").collect()
    )
    assert after == before
    assert t.watermark() == wm
    assert len(t._snap["manifests"]) == n_manifests
    assert t.fold_pending() == 0  # nothing pending → no new snapshot


def test_fold_pending_runs_major_compaction_check(spark, tmp_path):
    """fold_pending() must include the commit-path's staggered major
    check — a scheduler folding via fold_pending alone (no commit ever
    reaching max_deltas) would otherwise grow L1 unboundedly."""
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, n_buckets=2, max_deltas=2)
    # 12 single-batch merges, folding by hand every 2 — L1 file counts
    # cross the staggered cap (max_deltas + b%4) only via fold_pending
    for b in range(12):
        t.merge(_updates(spark, b * 150, b * 150 + 149), "job", b)
        if len(t._snap["deltas"]) >= 2:
            t.fold_pending()
    assert t._snap["buckets"], "major compaction never ran"
    for b, e in t._snap["l1"].items():
        cap = t.max_deltas + (int(b.split(":")[1]) % 4)
        assert len(e["files"]) < cap + 2


def test_bulk_run_ends_fully_folded(spark, tmp_path):
    """A bulk run of ≥ max_deltas batches overlaps its folds and ends
    with L0 empty — same final table state as tick-by-tick ingest."""
    import os

    from dlt_spark.plans.runner import run_incremental
    from dlt_spark.sources.changelog import write_change_log

    log = str(tmp_path / "log")
    n = 16_000
    write_change_log(
        generate_change_log(spark, n, seed=7, dup_frac=0.05), log, 2_000
    )
    ta = str(tmp_path / "ta")
    run_incremental(spark, log, ta, batch_width=2_000, n_buckets=8,
                    log_part_width=2_000)
    t = LakehouseTable.load(spark, ta)
    assert t._snap["deltas"] == []  # early + final folds drained L0

    tb = str(tmp_path / "tb")
    for b in range(8):
        run_incremental(spark, log, tb, seq_from=b * 2_000,
                        seq_to=(b + 1) * 2_000 - 1, batch_width=2_000,
                        n_buckets=8, log_part_width=2_000)
    t2 = LakehouseTable.load(spark, tb)
    rows_a = sorted(
        tuple(r)
        for r in t.read().select("doc_id", "_commit_seq", "_row_id").collect()
    )
    rows_b = sorted(
        tuple(r)
        for r in t2.read().select("doc_id", "_commit_seq", "_row_id").collect()
    )
    assert rows_a == rows_b
