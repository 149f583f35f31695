"""A minimal copy-on-write bucketed-Parquet table format with atomic
snapshot commits and idempotent commit manifests.

Why this exists: the design target is Iceberg v2 MERGE (SURVEY §2.5 M1),
but no Iceberg runtime jar ships in this sandbox and there is no network,
so the engine implements the three Iceberg properties the CDC semantics
actually rely on, on plain Parquet:

1. **Atomic snapshot commits** — a commit is the creation of
   ``_snapshots/v<N>.json`` via hard-link-from-temp (create-exclusive →
   atomic AND conflict-detecting on POSIX).  Readers resolve the highest
   version; a crash mid-write leaves only orphan data files, never a
   half-visible table.  (Iceberg: metadata.json swap.)
2. **Key-bucketed layout + bucket-pruned MERGE** — rows live in
   ``n_buckets`` hash(doc_id) buckets; a MERGE rewrites only the buckets
   its update keys touch, and scans only those buckets' files.  At 100 TB
   with 10^4 buckets a batch touching 1% of keys reads/writes ~1% of the
   table.  (Iceberg: ``PARTITIONED BY (bucket(N, doc_id))`` + partition
   pruning; SURVEY §4.2 destination layout.)
3. **Idempotent commit manifests** — each snapshot carries the set of
   applied ``(job_id, batch_id)`` plus per-batch lineage/metrics rows
   (SURVEY §2.5 M4).  Replaying an applied batch is a no-op; this closes
   the reference's at-least-once hole (destinations/postgres.go:105-118
   retries re-insert committed chunks; big_query.go:256 WriteAppend
   duplicates on replay).

The per-row guard ``u.commit_seq >= t._commit_seq`` inside the merge is
defense-in-depth: even a forced replay of an old range converges.

Scale notes: the snapshot JSON holds file lists + manifest rows — at the
10^10-event design point with 10^7-wide batches that is ~10^3 manifest
rows and (n_buckets × a few) file entries; both stay far below metadata
limits.  File counts per bucket stay O(1) because MERGE rewrites a
bucket wholesale (compaction is built into the write path).
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark import StorageLevel

from dlt_spark.schemas import MANIFEST_SCHEMA, TARGET_SCHEMA

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"


def _bucket_col(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


class LakehouseTable:
    """Handle to one copy-on-write table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, snap: dict):
        self.spark = spark
        self.path = path
        self._snap = snap

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls, spark: SparkSession, path: str, n_buckets: int = 64
    ) -> "LakehouseTable":
        """CREATE TABLE IF NOT EXISTS (SURVEY §2.1 S6)."""
        snap_dir = os.path.join(path, _SNAP_DIR)
        if os.path.isdir(snap_dir) and _latest_version(snap_dir) is not None:
            return cls.load(spark, path)
        os.makedirs(snap_dir, exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        snap = {
            "version": 0,
            "n_buckets": n_buckets,
            "files": {},  # bucket(str) -> [relative parquet paths]
            "applied": [],  # ["job_id::batch_id", ...]
            "manifests": [],  # rows per MANIFEST_SCHEMA
            "watermark": -1,  # highest seq_to applied
        }
        _commit_snapshot(snap_dir, snap)
        return cls(spark, path, snap)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakehouseTable":
        snap_dir = os.path.join(path, _SNAP_DIR)
        v = _latest_version(snap_dir)
        if v is None:
            raise FileNotFoundError(f"no snapshots under {snap_dir}")
        with open(os.path.join(snap_dir, _snap_name(v))) as f:
            return cls(spark, path, json.load(f))

    def refresh(self) -> "LakehouseTable":
        return LakehouseTable.load(self.spark, self.path)

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------
    @property
    def n_buckets(self) -> int:
        return self._snap["n_buckets"]

    @property
    def version(self) -> int:
        return self._snap["version"]

    def watermark(self) -> int:
        """Resume point: highest applied seq_to (SURVEY §2.2 P2 — the
        reference queries MAX(bundle_id) from the destination,
        destinations/postgres.go:49-62; here it is O(1) metadata)."""
        return self._snap["watermark"]

    def is_applied(self, job_id: str, batch_id: int) -> bool:
        return f"{job_id}::{batch_id}" in set(self._snap["applied"])

    def _files(self, buckets=None) -> list[str]:
        fm = self._snap["files"]
        keys = fm.keys() if buckets is None else [str(b) for b in buckets]
        return [os.path.join(self.path, rel) for k in keys for rel in fm.get(k, [])]

    def read(self, buckets=None, include_deleted: bool = False) -> DataFrame:
        """Current table state (optionally restricted to buckets).
        Tombstones (retained deletes) are filtered out unless
        ``include_deleted`` — only the merge path needs them."""
        files = self._files(buckets)
        if not files:
            from pyspark.sql.types import IntegerType, StructField, StructType

            # NB: StructType.add mutates in place — build a fresh copy.
            schema = StructType(
                list(TARGET_SCHEMA.fields)
                + [StructField("_bucket", IntegerType(), False)]
            )
            return self.spark.createDataFrame([], schema)
        # _bucket lives in the directory layout (partitionBy strips it
        # from file contents); project exactly the physical schema (so
        # path-based partition inference can never inject a duplicate
        # column) and re-derive _bucket — a pure function of doc_id.
        cols = [f.name for f in TARGET_SCHEMA.fields]
        df = (
            self.spark.read.schema(TARGET_SCHEMA)
            .parquet(*files)
            .select(*cols)
            .withColumn("_bucket", _bucket_col("doc_id", self.n_buckets))
        )
        if not include_deleted:
            df = df.where(~F.col("_deleted"))
        return df

    def manifests_df(self) -> DataFrame:
        rows = self._snap["manifests"]
        return self.spark.createDataFrame(rows, MANIFEST_SCHEMA)

    # ------------------------------------------------------------------
    # MERGE (SURVEY §2.5 M1) — the one write path
    # ------------------------------------------------------------------
    def merge(
        self,
        updates: DataFrame,
        job_id: str,
        batch_id: int,
        seq_from: int,
        seq_to: int,
        events_read: int | None = None,
        force: bool = False,
    ) -> dict:
        """Apply a deduped update set (unique doc_id; columns doc_id, op,
        tokens, n_tok, source, commit_seq) exactly once.

        Semantics of the Iceberg statement it stands in for::

            MERGE INTO target t USING updates u ON t.doc_id = u.doc_id
            WHEN MATCHED AND u.op = 'D' AND u.commit_seq >= t._commit_seq
                THEN DELETE
            WHEN MATCHED AND u.commit_seq >= t._commit_seq
                THEN UPDATE SET *
            WHEN NOT MATCHED AND u.op != 'D' THEN INSERT *

        Returns the manifest row (also persisted in the snapshot).
        """
        if self.is_applied(job_id, batch_id) and not force:
            return next(
                m
                for m in self._snap["manifests"]
                if m["job_id"] == job_id and m["batch_id"] == batch_id
            )

        nb = self.n_buckets
        has_counts = "_n_events" in updates.columns
        u = updates.withColumn("_bucket", _bucket_col("doc_id", nb))
        # Persist: the update set feeds two jobs (stats, then the merge
        # join+write) — without this the whole upstream read→normalize→
        # dedup pipeline would run twice.  MEMORY_AND_DISK so a huge
        # batch spills instead of OOMing.
        u = u.persist(StorageLevel.MEMORY_AND_DISK)
        persisted = u

        # Batch metrics + affected buckets in ONE aggregation pass over
        # the (already small, post-LWW) update set (SURVEY §2.4 A2/A3).
        count_aggs = [F.sum("_n_events").alias("ne")] if has_counts else []
        stats = u.groupBy("_bucket").agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("d"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            *count_aggs,
        ).collect()
        if not stats:
            persisted.unpersist()
            return self._commit_noop(job_id, batch_id, seq_from, seq_to, events_read)
        buckets = sorted(r["_bucket"] for r in stats)
        n_upd = sum(r["n"] for r in stats)
        n_del = sum(r["d"] for r in stats)
        min_doc = min(r["lo"] for r in stats)
        max_doc = max(r["hi"] for r in stats)
        if events_read is None and has_counts:
            events_read = sum(r["ne"] for r in stats)
        if has_counts:
            u = u.drop("_n_events")

        target = self.read(buckets=buckets, include_deleted=True)

        # Full-outer resolve on doc_id.  AQE broadcasts whichever side is
        # small and splits skewed partitions; both sides are restricted
        # to the affected buckets.
        t = target.select(
            F.col("doc_id").alias("t_doc_id"),
            F.col("tokens").alias("t_tokens"),
            F.col("n_tok").alias("t_n_tok"),
            F.col("source").alias("t_source"),
            F.col("_commit_seq").alias("t_seq"),
            F.col("_row_id").alias("t_row_id"),
            F.col("_deleted").alias("t_deleted"),
            F.col("_bucket").alias("t_bucket"),
        )
        j = u.join(t, u["doc_id"] == t["t_doc_id"], "full_outer")

        # The update wins iff it is at-or-after the stored row's seq —
        # including a stored TOMBSTONE's seq: this is what stops a forced
        # replay of an older range from resurrecting a later delete.
        upd_wins = F.col("doc_id").isNotNull() & (
            F.col("t_seq").isNull() | (F.col("commit_seq") >= F.col("t_seq"))
        )
        is_del = F.col("op") == "D"

        out_doc = F.when(upd_wins, F.col("doc_id")).otherwise(F.col("t_doc_id"))
        out_seq = F.when(upd_wins, F.col("commit_seq")).otherwise(F.col("t_seq"))
        out_deleted = F.when(upd_wins, is_del).otherwise(F.col("t_deleted"))
        live_val = lambda uc, tc: F.when(  # noqa: E731 — tombstones carry no payload
            upd_wins, F.when(~is_del, F.col(uc))
        ).otherwise(F.col(tc))
        result = (
            j.where(F.col("doc_id").isNotNull() | F.col("t_doc_id").isNotNull())
            .select(
                out_doc.alias("doc_id"),
                live_val("tokens", "t_tokens").alias("tokens"),
                live_val("n_tok", "t_n_tok").alias("n_tok"),
                live_val("source", "t_source").alias("source"),
                out_seq.alias("_commit_seq"),
                # Deterministic surrogate key (SURVEY §2.3 E2 — replaces
                # the reference's uuid.New at schema/base.go:28).
                F.when(
                    upd_wins,
                    F.sha2(F.concat_ws("|", out_doc, out_seq.cast("string")), 256),
                ).otherwise(F.col("t_row_id")).alias("_row_id"),
                out_deleted.alias("_deleted"),
                F.when(upd_wins, F.col("_bucket")).otherwise(F.col("t_bucket")).alias("_bucket"),
            )
        )

        # Copy-on-write: new files for affected buckets under a fresh
        # commit dir; untouched buckets keep their existing files.
        commit_rel = os.path.join(_DATA_DIR, f"commit-{uuid.uuid4().hex}")
        commit_abs = os.path.join(self.path, commit_rel)
        (
            result.repartition(max(1, min(len(buckets), 32)), "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(commit_abs)
        )
        persisted.unpersist()

        new_files = dict(self._snap["files"])
        for b in buckets:
            new_files[str(b)] = []
        for dirpath, _dirs, fnames in os.walk(commit_abs):
            for fn in fnames:
                if fn.endswith(".parquet"):
                    b = int(os.path.basename(dirpath).split("=", 1)[1])
                    rel = os.path.relpath(os.path.join(dirpath, fn), self.path)
                    new_files.setdefault(str(b), []).append(rel)

        manifest = {
            "job_id": job_id,
            "batch_id": int(batch_id),
            "seq_from": int(seq_from),
            "seq_to": int(seq_to),
            "events_read": int(events_read if events_read is not None else n_upd),
            "events_applied": int(n_upd),
            "deletes_applied": int(n_del),
            "min_doc_id": min_doc,
            "max_doc_id": max_doc,
            "committed_at": datetime.now(timezone.utc).isoformat(),
            "snapshot_version": self.version + 1,
        }
        self._commit(new_files, manifest)
        return manifest

    def _commit_noop(self, job_id, batch_id, seq_from, seq_to, events_read) -> dict:
        manifest = {
            "job_id": job_id,
            "batch_id": int(batch_id),
            "seq_from": int(seq_from),
            "seq_to": int(seq_to),
            "events_read": int(events_read or 0),
            "events_applied": 0,
            "deletes_applied": 0,
            "min_doc_id": None,
            "max_doc_id": None,
            "committed_at": datetime.now(timezone.utc).isoformat(),
            "snapshot_version": self.version + 1,
        }
        self._commit(dict(self._snap["files"]), manifest)
        return manifest

    def _commit(self, files: dict, manifest: dict) -> None:
        new_snap = {
            "version": self.version + 1,
            "n_buckets": self.n_buckets,
            "files": files,
            "applied": sorted(
                set(self._snap["applied"])
                | {f"{manifest['job_id']}::{manifest['batch_id']}"}
            ),
            "manifests": self._snap["manifests"] + [manifest],
            "watermark": max(self._snap["watermark"], manifest["seq_to"]),
        }
        _commit_snapshot(os.path.join(self.path, _SNAP_DIR), new_snap)
        self._snap = new_snap

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------
    def purge_tombstones(self, horizon_seq: int) -> int:
        """Physically drop tombstones with ``_commit_seq <= horizon_seq``.

        Contract (same shape as Iceberg/Delta vacuum horizons): after
        purging at H, forced replays of ranges ending at or below H are
        no longer resurrection-safe.  Normal watermark-resumed ingest is
        unaffected.  Returns the number of tombstones purged.
        """
        all_rows = self.read(include_deleted=True)
        purge = F.col("_deleted") & (F.col("_commit_seq") <= horizon_seq)
        n_purged = all_rows.where(purge).count()
        if n_purged == 0:
            return 0
        kept = all_rows.where(~purge)
        commit_rel = os.path.join(_DATA_DIR, f"purge-{uuid.uuid4().hex}")
        commit_abs = os.path.join(self.path, commit_rel)
        (
            kept.repartition(32, "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(commit_abs)
        )
        new_files: dict[str, list[str]] = {}
        for dirpath, _dirs, fnames in os.walk(commit_abs):
            for fn in fnames:
                if fn.endswith(".parquet"):
                    b = int(os.path.basename(dirpath).split("=", 1)[1])
                    rel = os.path.relpath(os.path.join(dirpath, fn), self.path)
                    new_files.setdefault(str(b), []).append(rel)
        new_snap = {
            "version": self.version + 1,
            "n_buckets": self.n_buckets,
            "files": new_files,
            "applied": self._snap["applied"],
            "manifests": self._snap["manifests"],
            "watermark": self._snap["watermark"],
        }
        _commit_snapshot(os.path.join(self.path, _SNAP_DIR), new_snap)
        self._snap = new_snap
        return n_purged

    def vacuum(self) -> int:
        """Delete data files not referenced by the latest snapshot
        (orphans from crashed commits / superseded bucket versions)."""
        live = {os.path.join(self.path, rel) for rel in
                (p for ps in self._snap["files"].values() for p in ps)}
        removed = 0
        data_root = os.path.join(self.path, _DATA_DIR)
        for dirpath, _dirs, fnames in os.walk(data_root, topdown=False):
            for fn in fnames:
                p = os.path.join(dirpath, fn)
                if p.endswith(".parquet") and p not in live:
                    os.unlink(p)
                    removed += 1
            if not os.listdir(dirpath) and dirpath != data_root:
                os.rmdir(dirpath)
        return removed


# ---------------------------------------------------------------------------
# snapshot file helpers
# ---------------------------------------------------------------------------
def _snap_name(v: int) -> str:
    return f"v{v:012d}.json"


def _latest_version(snap_dir: str) -> int | None:
    try:
        versions = [
            int(f[1:-5]) for f in os.listdir(snap_dir)
            if f.startswith("v") and f.endswith(".json")
        ]
    except FileNotFoundError:
        return None
    return max(versions) if versions else None


def _commit_snapshot(snap_dir: str, snap: dict) -> None:
    """Atomic, conflict-detecting publish: write temp, hard-link to the
    final name (link(2) fails with EEXIST if another writer won — the
    optimistic-concurrency check), unlink temp."""
    final = os.path.join(snap_dir, _snap_name(snap["version"]))
    fd, tmp = tempfile.mkstemp(dir=snap_dir, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(snap, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)
        except FileExistsError as e:
            raise RuntimeError(
                f"snapshot conflict: {final} already committed by a concurrent writer"
            ) from e
    finally:
        os.unlink(tmp)
