"""A minimal merge-on-read bucketed-Parquet table format with atomic
snapshot commits and idempotent commit manifests.

Why this exists: the design target is Iceberg v2 MoR MERGE (SURVEY §2.5
M1), but no Iceberg runtime jar ships in this sandbox and there is no
network, so the engine implements the Iceberg properties the CDC
semantics rely on, on plain Parquet:

1. **Atomic snapshot commits** — a commit is the creation of
   ``_snapshots/v<N>.json`` via hard-link-from-temp (create-exclusive →
   atomic AND conflict-detecting on POSIX).  Readers resolve the highest
   version; a crash mid-write leaves only orphan data files, never a
   half-visible table.  (Iceberg: metadata.json swap.)
2. **Merge-on-read ingest** — a MERGE batch writes ONLY its deduped
   update set as per-bucket *delta* files: O(batch) work, independent of
   table size.  The read path resolves last-writer-wins per key across
   base+delta rows (max (_commit_seq, tombstone-rank, _row_id)); stale
   rows from forced replays simply lose the resolve — no row-level
   guard join needed.  (Iceberg v2: equality deletes + MoR scan.)
   This replaces an earlier copy-on-write design whose per-batch cost
   was O(table) once updates touched every bucket — at the 10^10-event
   design point each ingest batch would have rewritten ~100 TB.
3. **Amortized compaction** — when a bucket accumulates ``max_deltas``
   delta files, the merge folds base+deltas into a new resolved base
   for just that bucket (copy-on-write at 1/max_deltas frequency), so
   read amplification stays bounded.  (Iceberg: rewrite_data_files.)
4. **Idempotent commit manifests** — each snapshot carries the set of
   applied ``(job_id, batch_id)`` plus per-batch lineage/metrics rows
   (SURVEY §2.5 M4).  Replaying an applied batch is a no-op; this closes
   the reference's at-least-once hole (destinations/postgres.go:105-118
   retries re-insert committed chunks; big_query.go:256 WriteAppend
   duplicates on replay).
5. **Tombstone retention** — deletes persist as ``_deleted`` rows (the
   resolve needs the delete's _commit_seq to reject stale re-inserts
   from forced replays of older ranges); reads filter them;
   ``purge_tombstones(horizon)`` reclaims below a replay horizon.

Hash-bucketing on doc_id (``n_buckets`` fixed per table) is the analog
of Iceberg ``PARTITIONED BY (bucket(N, doc_id))``: bucket-local
compaction and bucket-pruned point reads (SURVEY §4.2).

Scale notes: snapshot JSON holds file lists + manifest rows — at the
10^10-event design point with 10^7-wide batches that is ~10^3 manifest
rows and O(n_buckets × max_deltas) file entries; both stay far below
metadata limits.  The resolve shuffle on read is the MoR tax; compaction
bounds it to ≤ max_deltas delta files per bucket.
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid
from datetime import datetime, timezone

from pyspark import StorageLevel  # noqa: F401  (re-export for callers)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from dlt_spark.schemas import MANIFEST_SCHEMA, TARGET_SCHEMA

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"


def _bucket_col(key_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_buckets)).cast("int")


def _read_schema(
    extra_n_events: bool = False, extras: list | None = None
) -> StructType:
    """Physical read schema: core TARGET columns + evolved extras
    (+ the delta-only _n_events).  Files written before a column was
    added simply lack it — Spark backfills nulls, which IS the
    evolution semantics (Iceberg add-column analog)."""
    from pyspark.sql.types import _parse_datatype_string

    fields = list(TARGET_SCHEMA.fields)
    for name, ddl in extras or []:
        fields.append(StructField(name, _parse_datatype_string(ddl), True))
    if extra_n_events:
        fields.append(StructField("_n_events", LongType(), True))
    return StructType(fields)


# columns of the change-event envelope that are NOT value payload
_NON_VALUE_EVENT_COLS = {
    "doc_id", "op", "tokens", "n_tok", "source", "commit_seq",
    "payload", "payload_version", "extracted_at", "_n_events",
}


class LakehouseTable:
    """Handle to one merge-on-read table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, snap: dict):
        self.spark = spark
        self.path = path
        self._snap = snap

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        n_buckets: int = 64,
        max_deltas: int = 8,
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
            "max_deltas": max_deltas,  # L0 commit cap (and L1 per-bucket cap)
            # Leveled layout (LSM-style; Iceberg analog: data files +
            # positional deltas + rewrite_data_files):
            #   L0 "deltas":  [[rel paths], …] — one entry per ingest
            #     commit, UNBUCKETED (written straight out of the dedup
            #     shuffle: zero extra shuffle on the hot path)
            #   L1 "l1":      bucket(str) → [rel paths] — bucket-pure,
            #     resolved folds of L0 (cost O(L0) every max_deltas
            #     commits, independent of table size)
            #   base "buckets": bucket(str) → [rel paths] — bucket-pure,
            #     fully resolved; rebuilt bucket-locally when a bucket's
            #     L1 count hits its (staggered) cap — cost O(bucket),
            #     never O(table)
            "buckets": {},
            "l1": {},
            "deltas": [],
            # evolved value columns beyond TARGET_SCHEMA: [[name, ddl], …]
            # (Iceberg schema-evolution analog: add-column only; a type
            # conflict on an existing column is rejected at merge time)
            "extra_columns": [],
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
    def max_deltas(self) -> int:
        return self._snap.get("max_deltas", 8)

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

    def _abs(self, rels: list[str]) -> list[str]:
        return [os.path.join(self.path, r) for r in rels]

    @property
    def extra_columns(self) -> list:
        return [tuple(e) for e in self._snap.get("extra_columns", [])]

    def _raw(self, files: list[str], extras: list | None = None) -> DataFrame:
        """Read data files with the physical schema (delta files carry an
        extra _n_events column; base files don't — permissive schema;
        files older than an evolved column backfill nulls)."""
        if extras is None:
            extras = self.extra_columns
        if not files:
            schema = _read_schema(extras=extras).add(
                "_bucket", IntegerType(), False
            )
            return self.spark.createDataFrame([], schema)
        cols = [f.name for f in TARGET_SCHEMA.fields] + [n for n, _ in extras]
        return (
            self.spark.read.schema(_read_schema(extra_n_events=True, extras=extras))
            .parquet(*files)
            .select(*cols)
            .withColumn("_bucket", _bucket_col("doc_id", self.n_buckets))
        )

    @staticmethod
    def _resolve(df: DataFrame) -> DataFrame:
        """MoR resolve: one winning row per doc_id — max by
        (_commit_seq, tombstone-rank, _row_id).  The tombstone rank makes
        a delete beat a concurrent non-delete at equal seq, matching
        dedup_lww's D > U/I priority; _row_id is a deterministic final
        tie-break for byte-identical duplicate deliveries."""
        cols = df.columns
        ordering = F.struct(
            F.col("_commit_seq").alias("_s"),
            F.col("_deleted").cast("int").alias("_d"),
            F.col("_row_id").alias("_r"),
        )
        winner = F.max_by(F.struct(*[F.col(c) for c in cols]), ordering).alias("w")
        return df.groupBy("doc_id").agg(winner).select("w.*")

    @property
    def _l1(self) -> dict:
        return self._snap.get("l1", {})

    def read(self, buckets=None, include_deleted: bool = False) -> DataFrame:
        """Current table state (optionally restricted to buckets).
        Resolves base+L1+L0 rows per key; tombstones filtered unless
        ``include_deleted``.  Bucket restriction prunes base/L1 files by
        path and L0 rows by predicate (L0 is unbucketed)."""
        bm = self._snap["buckets"]
        keys = bm.keys() if buckets is None else [str(b) for b in buckets]
        base = [p for k in keys for p in bm.get(k, [])]
        l1_keys = self._l1.keys() if buckets is None else [str(b) for b in buckets]
        l1 = [p for k in l1_keys for p in self._l1.get(k, [])]
        l0 = [p for ps in self._snap["deltas"] for p in ps]
        df = self._raw(self._abs(base + l1 + l0))
        if buckets is not None and l0:
            df = df.where(F.col("_bucket").isin([int(b) for b in buckets]))
        if l0 or l1:  # base alone is already one-row-per-key
            df = self._resolve(df)
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
        seq_from: int | None = None,
        seq_to: int | None = None,
        events_read: int | None = None,
        force: bool = False,
    ) -> dict:
        """Apply a deduped update set (unique doc_id; columns doc_id, op,
        tokens, n_tok, source, commit_seq, optional _n_events) exactly
        once.  Semantics of the Iceberg statement it stands in for::

            MERGE INTO target t USING updates u ON t.doc_id = u.doc_id
            WHEN MATCHED AND u.op = 'D' AND u.commit_seq >= t._commit_seq
                THEN DELETE            -- here: tombstone row, wins resolve
            WHEN MATCHED AND u.commit_seq >= t._commit_seq
                THEN UPDATE SET *      -- here: delta row, wins resolve
            WHEN NOT MATCHED AND u.op != 'D' THEN INSERT *

        MoR: ONE write of the batch-sized update set; stale updates lose
        the read-time resolve instead of being filtered by a join.
        Returns the manifest row (also persisted in the snapshot).

        Internally split into ``prepare_delta`` (parallel-safe: runs the
        pipeline and writes delta files, touches no table state) and
        ``commit_delta`` (ordered: snapshot mutation + compaction), so a
        runner can pipeline batch k+1's compute under batch k's commit —
        the Spark analog of the reference's staged pipeline
        (loader/service.go:82-97, SURVEY §2.7 X1).
        """
        if self.is_applied(job_id, batch_id) and not force:
            return next(
                m
                for m in self._snap["manifests"]
                if m["job_id"] == job_id and m["batch_id"] == batch_id
            )
        prepared = self.prepare_delta(updates, job_id, batch_id)
        return self.commit_delta(
            prepared, job_id, batch_id, seq_from, seq_to, events_read, force
        )

    def prepare_delta(self, updates: DataFrame, job_id: str, batch_id: int) -> dict:
        """Run the update pipeline and write delta files.  Stateless wrt
        the snapshot — safe to run concurrently for different batches."""
        has_counts = "_n_events" in updates.columns
        is_del = F.col("op") == "D"
        # schema evolution: any update column outside the change-event
        # envelope is a new/evolved value column — carried through the
        # delta and registered in the snapshot at commit
        extras = [
            (f.name, f.dataType.simpleString())
            for f in updates.schema.fields
            if f.name not in _NON_VALUE_EVENT_COLS
        ]
        rows = updates.select(
            "doc_id",
            F.when(~is_del, F.col("tokens")).alias("tokens"),
            F.when(~is_del, F.col("n_tok")).cast("int").alias("n_tok"),
            F.when(~is_del, F.col("source")).alias("source"),
            *[F.when(~is_del, F.col(n)).alias(n) for n, _ in extras],
            F.col("commit_seq").cast("long").alias("_commit_seq"),
            # Deterministic surrogate key (SURVEY §2.3 E2 — replaces the
            # reference's uuid.New at schema/base.go:28).
            F.sha2(
                F.concat_ws("|", F.col("doc_id"), F.col("commit_seq").cast("string")),
                256,
            ).alias("_row_id"),
            is_del.alias("_deleted"),
            *([F.col("_n_events").cast("long")] if has_counts else []),
        )

        # ONE pass over the upstream pipeline, ZERO extra shuffle: the
        # deduped batch is written as-is (its partitioning is whatever the
        # dedup groupBy produced).  Bucketing happens at compaction.
        # Batch metrics ride along via Observation — collected DURING the
        # write job, so the batch costs exactly one job (SURVEY §2.4 A2:
        # the reference's running counters, without a second pass).
        from pyspark.sql import Observation

        obs = Observation(f"merge-{job_id}-{batch_id}")
        rows = rows.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_deleted").cast("int")).alias("d"),
            F.min("doc_id").alias("lo"),
            F.max("doc_id").alias("hi"),
            F.min("_commit_seq").alias("smin"),
            F.max("_commit_seq").alias("smax"),
            # order-insensitive batch content hash (SURVEY §2.1 S2):
            # sum of bounded per-row hashes — commutative, overflow-safe
            # up to ~10^9 rows per batch
            F.sum(
                F.pmod(
                    F.xxhash64("doc_id", "_commit_seq", "_row_id", "_deleted"),
                    F.lit(1 << 30),
                )
            ).alias("dh"),
            *([F.sum("_n_events").alias("ne")] if has_counts else []),
        )
        commit_rel = os.path.join(_DATA_DIR, f"delta-{uuid.uuid4().hex}")
        commit_abs = os.path.join(self.path, commit_rel)
        # Dictionary encoding off: token ids are near-random, so parquet
        # dictionaries only add build+lookup cost (measured +6% ingest).
        (
            rows.write.mode("overwrite")
            .option("parquet.enable.dictionary", "false")
            .parquet(commit_abs)
        )
        new_files = _list_parquet_files(commit_abs, self.path)
        if not new_files:
            return {"files": [], "stats": None, "has_counts": has_counts,
                    "extras": extras}
        stats = dict(obs.get)
        if not has_counts:
            stats["ne"] = None
        return {"files": new_files, "stats": stats, "has_counts": has_counts,
                "extras": extras}

    def commit_delta(
        self,
        prepared: dict,
        job_id: str,
        batch_id: int,
        seq_from: int | None = None,
        seq_to: int | None = None,
        events_read: int | None = None,
        force: bool = False,
    ) -> dict:
        """Publish a prepared delta: manifest + (maybe) compaction + the
        atomic snapshot swap.  Must be called in batch order."""
        if self.is_applied(job_id, batch_id) and not force:
            return next(
                m
                for m in self._snap["manifests"]
                if m["job_id"] == job_id and m["batch_id"] == batch_id
            )
        stats = prepared["stats"]
        if stats is None or stats["n"] == 0:
            return self._commit_noop(job_id, batch_id, seq_from, seq_to, events_read)
        # Streaming epochs don't know their seq range up front — derive
        # it from the delta's observed min/max (no extra job).
        if seq_from is None:
            seq_from = int(stats["smin"])
        if seq_to is None:
            seq_to = int(stats["smax"])
        if events_read is None:
            events_read = (
                stats["ne"]
                if prepared["has_counts"] and stats["ne"] is not None
                else stats["n"]
            )

        # register evolved columns (add-only; type conflicts rejected)
        extra_cols = [list(e) for e in self._snap.get("extra_columns", [])]
        known = {n: d for n, d in extra_cols}
        for n, d in prepared.get("extras", []):
            if n in known:
                if known[n] != d:
                    raise ValueError(
                        f"schema evolution conflict on column {n!r}: "
                        f"table has {known[n]}, batch has {d}"
                    )
            else:
                extra_cols.append([n, d])
                known[n] = d

        buckets_map = dict(self._snap["buckets"])
        l1_map = {k: list(v) for k, v in self._l1.items()}
        deltas = self._snap["deltas"] + [prepared["files"]]

        new_extras = [tuple(e) for e in extra_cols]
        if len(deltas) >= self.max_deltas:
            # L0 → L1 fold: resolve + bucket the pending commits.  Cost
            # O(sum of L0) = O(max_deltas batches), independent of table
            # size.
            for b, ps in self._fold_l0(deltas, extras=new_extras).items():
                l1_map.setdefault(b, []).extend(ps)
            deltas = []
            # Bucket-local major compaction: rebuild base for buckets
            # whose L1 count hits a per-bucket STAGGERED cap (b % 4
            # jitter spreads majors over fold points instead of one
            # global O(table) spike).  Cost O(selected buckets).
            over = [
                b for b, ps in l1_map.items()
                if len(ps) >= self.max_deltas + (int(b) % 4)
            ]
            if over:
                compacted = self._major_compact(
                    buckets_map, l1_map, over, extras=new_extras
                )
                for b, ps in compacted.items():
                    buckets_map[b] = ps
                for b in over:
                    l1_map[b] = []

        manifest = {
            "job_id": job_id,
            "batch_id": int(batch_id),
            "seq_from": int(seq_from),
            "seq_to": int(seq_to),
            "events_read": int(events_read),
            "events_applied": int(stats["n"]),
            "deletes_applied": int(stats["d"] or 0),
            "min_doc_id": stats["lo"],
            "max_doc_id": stats["hi"],
            "committed_at": datetime.now(timezone.utc).isoformat(),
            "snapshot_version": self.version + 1,
            "data_hash": int(stats["dh"] or 0),
            "delta_files": prepared["files"],
        }
        self._commit(buckets_map, l1_map, deltas, manifest, extra_cols)
        return manifest

    def verify_batch(self, job_id: str, batch_id: int) -> bool | None:
        """Integrity check (SURVEY §2.1 S2): recompute the manifest's
        order-insensitive content hash from the batch's own delta files.
        Returns None when the files were compacted away (row-level
        verification window closed), True/False otherwise."""
        m = next(
            (
                m
                for m in self._snap["manifests"]
                if m["job_id"] == job_id and m["batch_id"] == batch_id
            ),
            None,
        )
        if m is None or m.get("data_hash") is None:
            return False
        files = self._abs(m.get("delta_files") or [])
        if not files or not all(os.path.exists(f) for f in files):
            return None
        got = (
            self._raw(files)
            .agg(
                F.sum(
                    F.pmod(
                        F.xxhash64("doc_id", "_commit_seq", "_row_id", "_deleted"),
                        F.lit(1 << 30),
                    )
                ).alias("dh")
            )
            .collect()[0]["dh"]
        )
        return int(got or 0) == m["data_hash"]

    def _write_partitions(self) -> int:
        return min(self.n_buckets, int(
            self.spark.conf.get("spark.sql.shuffle.partitions", "32")
        ))

    def _write_bucketed(self, df: DataFrame, prefix: str) -> dict[str, list[str]]:
        commit_abs = os.path.join(self.path, _DATA_DIR, f"{prefix}-{uuid.uuid4().hex}")
        (
            df.repartition(self._write_partitions(), "_bucket")
            .write.mode("overwrite")
            .option("parquet.enable.dictionary", "false")
            .partitionBy("_bucket")
            .parquet(commit_abs)
        )
        return _list_bucket_files(commit_abs, self.path)

    def _fold_l0(self, deltas: list, extras: list | None = None) -> dict[str, list[str]]:
        """L0 → L1: resolve the pending unbucketed commits among
        themselves and write them bucket-pure.  O(L0 volume)."""
        paths = [p for ps in deltas for p in ps]
        resolved = self._resolve(self._raw(self._abs(paths), extras=extras))
        return self._write_bucketed(resolved, "l1")

    def _major_compact(
        self, buckets_map: dict, l1_map: dict, buckets: list[str],
        extras: list | None = None,
    ) -> dict[str, list[str]]:
        """Bucket-local major compaction: fold base+L1 of ONLY the given
        buckets into fresh bases.  O(selected buckets), never O(table).
        Caller must have folded L0 first (L0 rows are unbucketed and
        could otherwise supersede rows of these buckets)."""
        paths = [p for b in buckets for p in buckets_map.get(b, [])]
        paths += [p for b in buckets for p in l1_map.get(b, [])]
        resolved = self._resolve(self._raw(self._abs(paths), extras=extras))
        out = self._write_bucketed(resolved, "base")
        for b in buckets:  # a bucket may resolve to nothing (post-purge)
            out.setdefault(b, [])
        return out

    def _commit_noop(self, job_id, batch_id, seq_from, seq_to, events_read) -> dict:
        manifest = {
            "job_id": job_id,
            "batch_id": int(batch_id),
            "seq_from": int(seq_from if seq_from is not None else -1),
            "seq_to": int(seq_to if seq_to is not None else -1),
            "events_read": int(events_read or 0),
            "events_applied": 0,
            "deletes_applied": 0,
            "min_doc_id": None,
            "max_doc_id": None,
            "committed_at": datetime.now(timezone.utc).isoformat(),
            "snapshot_version": self.version + 1,
            "data_hash": None,
            "delta_files": None,
        }
        self._commit(
            dict(self._snap["buckets"]),
            {k: list(v) for k, v in self._l1.items()},
            list(self._snap["deltas"]),
            manifest,
        )
        return manifest

    def _commit(
        self,
        buckets_map: dict,
        l1_map: dict,
        deltas: list,
        manifest: dict,
        extra_columns: list | None = None,
    ) -> None:
        new_snap = {
            "version": self.version + 1,
            "n_buckets": self.n_buckets,
            "max_deltas": self.max_deltas,
            "buckets": buckets_map,
            "l1": l1_map,
            "deltas": deltas,
            "extra_columns": (
                extra_columns
                if extra_columns is not None
                else self._snap.get("extra_columns", [])
            ),
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
    def compact(self) -> None:
        """Full maintenance compaction: fold L0+L1+base into fresh
        bucket-pure bases (the explicit, all-at-once form of what the
        ingest path does incrementally)."""
        if not self._snap["deltas"] and not any(self._l1.values()):
            return
        paths = [p for ps in self._snap["buckets"].values() for p in ps]
        paths += [p for ps in self._l1.values() for p in ps]
        paths += [p for ps in self._snap["deltas"] for p in ps]
        resolved = self._resolve(self._raw(self._abs(paths)))
        buckets_map = self._write_bucketed(resolved, "base")
        new_snap = dict(
            self._snap,
            version=self.version + 1,
            buckets=buckets_map,
            l1={},
            deltas=[],
        )
        _commit_snapshot(os.path.join(self.path, _SNAP_DIR), new_snap)
        self._snap = new_snap

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
        new_snap = dict(
            self._snap,
            version=self.version + 1,
            buckets=self._write_bucketed(kept, "base"),
            l1={},
            deltas=[],
        )
        _commit_snapshot(os.path.join(self.path, _SNAP_DIR), new_snap)
        self._snap = new_snap
        return n_purged

    def vacuum(self) -> int:
        """Delete data files not referenced by the latest snapshot
        (orphans from crashed commits / superseded compactions)."""
        live = {
            os.path.join(self.path, rel)
            for ps in (
                list(self._snap["buckets"].values())
                + list(self._l1.values())
                + self._snap["deltas"]
            )
            for rel in ps
        }
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
def _list_bucket_files(commit_abs: str, table_root: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    for dirpath, _dirs, fnames in os.walk(commit_abs):
        for fn in fnames:
            if fn.endswith(".parquet"):
                b = os.path.basename(dirpath).split("=", 1)[1]
                rel = os.path.relpath(os.path.join(dirpath, fn), table_root)
                out.setdefault(str(int(b)), []).append(rel)
    return out


def _list_parquet_files(commit_abs: str, table_root: str) -> list[str]:
    out: list[str] = []
    for dirpath, _dirs, fnames in os.walk(commit_abs):
        for fn in fnames:
            if fn.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(dirpath, fn), table_root))
    return out


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
