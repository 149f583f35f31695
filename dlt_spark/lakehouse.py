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
   half-visible table.  (Iceberg: metadata.json swap.)  A losing writer
   retries against the refreshed snapshot with bounded backoff
   (``commit_delta`` conflict loop) — concurrent jobs are hands-free.
2. **Merge-on-read ingest** — a MERGE batch writes ONLY its deduped
   update set as *delta* files: O(batch) work, independent of table
   size.  (Iceberg v2: equality deletes + MoR scan.)  This replaces an
   earlier copy-on-write design whose per-batch cost was O(table) once
   updates touched every bucket — at the 10^10-event design point each
   ingest batch would have rewritten ~100 TB.
3. **Tiered MoR read** — the read-time LWW resolve never shuffles a
   large base.  Pending (L0+L1) and base row counts are tracked in
   snapshot metadata, so the reader picks a plan WITHOUT running a job:
     tier 2 (default merge path, base ≫ pending): broadcast the pending
       KEY SET, split base into untouched (anti) / touched (semi)
       streams and resolve touched ∪ pending — base is scanned, never
       exchanged; measured fastest above ~600k base rows (constants in
       the cost-model comment below);
     tier 1 (opt-in, I/O-bound object stores): resolve pending ONCE
       (localCheckpoint — the subtree's three consumers need different
       exchange kinds, so ReuseExchange can't dedupe it), broadcast the
       resolved delta FULL rows and LEFT-join onto base with an inline
       per-row LWW struct comparison — ONE full-width base scan (tier 2
       takes two) plus a doc_id-only probe, zero base exchange.  With
       the single resolve it ties/edges tier 2 locally (677k base:
       1.93s vs 2.05s median-of-5); tier 2 stays the auto default for
       its smaller broadcast (keys, not rows) — opt into tier 1 when
       base bytes rescanned is the dominant cost;
     tier 3 (small base / unknown metadata / pending >20M keys): the
       plain full resolve — the only tier that shuffles base, chosen
       exactly when that shuffle is cheap or unavoidable.
   At the 10^10-event design point every inter-compaction read was a
   ~100 TB Exchange before this; now the base never crosses the wire.
4. **Amortized leveled compaction** — L0 (per-commit, unbucketed) folds
   into bucket-pure L1 every ``max_deltas`` commits (cost O(L0));
   buckets whose L1 count hits a staggered cap fold into fresh bases
   (cost O(bucket), never O(table)).  (Iceberg: rewrite_data_files.)
5. **Idempotent commit manifests** — each snapshot carries the applied
   ``(job_id, batch_id)`` set as compressed ID RANGES plus per-batch
   lineage/metrics rows (SURVEY §2.5 M4).  Replaying an applied batch
   is a no-op; this closes the reference's at-least-once hole
   (destinations/postgres.go:105-118 retries re-insert committed
   chunks; big_query.go:256 WriteAppend duplicates on replay).
   Manifest history beyond a retained tail spills to Parquet sidecars
   (``_manifests/``), so snapshot JSON stays O(tail), not O(commits) —
   a long-lived streaming job's commit latency is flat.
6. **Tombstone retention** — deletes persist as ``_deleted`` rows (the
   resolve needs the delete's _commit_seq to reject stale re-inserts
   from forced replays of older ranges); reads filter them;
   ``purge_tombstones(horizon)`` reclaims below a replay horizon.

Hash-bucketing on doc_id (``n_buckets`` fixed per table) is the analog
of Iceberg ``PARTITIONED BY (bucket(N, doc_id))``: bucket-local
compaction and bucket-pruned point reads (SURVEY §4.2).

Schema evolution (Iceberg analog): new value columns register at commit
(add-column, null backfill in older files); existing evolved columns may
WIDEN (int→long, float→double — Spark 4 Parquet readers up-cast at scan
time) and RENAME (logical-name mapping kept in the snapshot; reads
coalesce the physical names).
"""

from __future__ import annotations

import bisect
import json
import os
import time
import uuid
from datetime import datetime, timezone

from pyspark import StorageLevel  # noqa: F401  (re-export for callers)
from pyspark.sql import DataFrame, SparkSession

from dlt_spark.metafs import LocalMetaFS, MetaFS
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

from dlt_spark.schemas import MANIFEST_SCHEMA, TARGET_SCHEMA

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"
_MANIFEST_DIR = "_manifests"
# Per-bucket file-list sidecars (Iceberg manifest-list → manifest
# indirection analog): the snapshot JSON stores only {bucket: sidecar
# ref}; the sidecar holds the actual data-file paths for the buckets a
# commit touched.  A plain ingest commit touches NO buckets, so its
# snapshot rewrite is O(n_buckets refs + manifest tail) — never O(live
# data files).  At the 10^10-event design point (~800k base files) the
# previous inline layout serialized tens of MB of JSON per commit; now
# a commit writes one sidecar of O(changed buckets) and the snapshot
# stays O(n_buckets).  Inline-retained lists and why they're bounded:
# L0 "deltas" ≤ max_deltas commits × ~10²-file lists (a batch's delta is
# AQE-coalesced to target file sizes — ~80 files for a 10 GB batch) and
# the manifest tail ≤ MANIFEST_TAIL rows of the same shape.
_FILELIST_DIR = "_filelists"

# Manifest rows retained inline in the snapshot; beyond 2× the tail the
# oldest spill to a Parquet sidecar (read back via manifests_df).
MANIFEST_TAIL = 64

# Tiered-read thresholds (pending rows, from snapshot metadata — no job
# runs to choose the plan).  Tier 1 broadcasts FULL resolved delta rows
# (payload included, ~300 B/row with tokens → ≤ ~300 MB); tier 2
# broadcasts only the key set (~30 B/key → ≤ ~600 MB at the cap).
BROADCAST_ROWS_T1 = 1_000_000
BROADCAST_KEYS_T2 = 20_000_000
# Merge path pays extra stages + O(pending) resolves; a full resolve
# pays one shuffle of base∪pending.  Measured crossovers (local[32],
# tmpfs shuffle, 7 pending deltas — see BENCH/PLANS.md):
#   base 122k rows: full resolve 1.15s, key-split 1.56s  → resolve wins
#   base 450k rows: 1.92s vs 2.01s                       → break-even
#   base 686k rows: 2.95s vs 2.66s                       → key-split wins
# On a real cluster the gap widens with base size: the full resolve
# ships the whole base over the network every read, the merge tiers
# never do.  Below BOTH floors the plain resolve is simply the faster
# plan and its base shuffle is harmless.
BASE_OVER_PENDING_MIN = 4
BASE_ROWS_MIN_MERGE = 600_000

# Cascade equality-delete markers (opt-in mode): the per-parent marker
# map broadcasts below this row bound (markers are per parent-DELETE —
# a ~24 B/row struct, ≤ ~25 MB at the cap); above it the read-side
# application falls back to a shuffle join (AQE still broadcasts if the
# runtime size allows).
MARKER_BROADCAST_ROWS = 1_000_000

# Parquet widening promotions Spark 4 readers apply at scan time
# (SPARK-40876): physical type → readable-as types.
_WIDEN_OK = {
    "int": {"bigint", "double"},
    "float": {"double"},
    "smallint": {"int", "bigint", "double"},
}


def _bucket_col(key_expr: str, n_buckets: int):
    """Bucket id of a row: hash of the bucket-key EXPRESSION (usually
    the key column; tables may declare a transform — e.g. the exploded
    schema buckets child rows by their PARENT id so whole documents
    co-locate and parent-keyed lookups bucket-prune, the Iceberg
    partition-transform analog)."""
    return F.pmod(F.xxhash64(F.expr(key_expr)), F.lit(n_buckets)).cast("int")


# ---------------------------------------------------------------------------
# bucket keys are MODULUS-QUALIFIED: "m:r" = hash residue r under modulus
# m.  n_buckets is the CURRENT write modulus; split_buckets() raises it
# (Iceberg partition-spec-evolution analog), and because every historical
# modulus divides the current one, an old entry (m, r) is exactly the
# union of current residues {r, r+m, r+2m, …} — old files stay readable
# and prunable without any rewrite; compaction rewrites them at the
# current modulus as it touches them.
# ---------------------------------------------------------------------------
def _bkey(m: int, r: int) -> str:
    return f"{m}:{r}"


def _bkey_parse(key: str) -> tuple[int, int]:
    m, _, r = key.partition(":")
    return int(m), int(r)


def _key_matches_residues(key: str, residues: set[int]) -> bool:
    """Does entry (m, r) contain any of the given residues under the
    CURRENT modulus?  (m divides the current modulus by construction.)"""
    m, r = _bkey_parse(key)
    return any(b % m == r for b in residues)


def _keys_overlap(k1: str, k2: str) -> bool:
    """Do two modulus-qualified residue classes intersect?  With all
    moduli dividing the current one, classes are hierarchical: they
    intersect iff the finer is congruent to the coarser."""
    m1, r1 = _bkey_parse(k1)
    m2, r2 = _bkey_parse(k2)
    if m1 <= m2:
        return m2 % m1 == 0 and r2 % m1 == r1
    return m1 % m2 == 0 and r1 % m2 == r2


def suggest_n_buckets(
    expected_rows: int,
    bytes_per_row: int = 300,
    target_bucket_bytes: int = 2 << 30,
) -> int:
    """Creation-time sizing rule (VERDICT r2 #2): pick the bucket count
    so a fully-compacted bucket lands near ``target_bucket_bytes`` (2 GB
    default — large enough that bucket-local compaction amortizes, small
    enough that a major rewrite or a touched-bucket resolve is never a
    multi-TB spike).  Rounded up to a power of two so later
    ``split_buckets`` doublings keep every historical modulus dividing
    the current one.  At the 10^10-event design point (~300 B/row → 3 TB
    live) this gives 2048 buckets; a 100 TB table gets 65536."""
    want = max(1, (expected_rows * bytes_per_row) // target_bucket_bytes)
    n = 8
    while n < want and n < (1 << 20):
        n <<= 1
    return n


def _read_schema(
    extra_n_events: bool = False, extras: list | None = None
) -> StructType:
    """Physical read schema: core TARGET columns + evolved extras
    (+ the delta-only _n_events).  Files written before a column was
    added simply lack it — Spark backfills nulls, which IS the
    evolution semantics (Iceberg add-column analog).  Files written
    before a widen carry the narrower physical type — Spark 4 Parquet
    readers up-cast int→long / float→double at scan time."""
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


# ---------------------------------------------------------------------------
# applied-set ranges: {job_id: [[lo, hi], ...]} sorted, disjoint,
# inclusive.  O(log n) membership, O(1) amortized growth for the common
# monotone batch-id sequence — the snapshot stays O(#jobs + #gaps)
# instead of O(#batches).
# ---------------------------------------------------------------------------
def _ranges_contains(ranges: list, x: int) -> bool:
    i = bisect.bisect_right(ranges, [x, float("inf")]) - 1
    return i >= 0 and ranges[i][0] <= x <= ranges[i][1]


def _ranges_add(ranges: list, x: int) -> list:
    i = bisect.bisect_right(ranges, [x, float("inf")])
    if i > 0 and ranges[i - 1][0] <= x <= ranges[i - 1][1]:
        return ranges
    out = ranges[: i - 1] if i > 0 else []
    lo = hi = x
    if i > 0:
        plo, phi = ranges[i - 1]
        if phi == x - 1:
            lo = plo
        else:
            out.append(ranges[i - 1])
    rest = ranges[i:]
    if rest and rest[0][0] == x + 1:
        hi = rest[0][1]
        rest = rest[1:]
    out.append([lo, hi])
    out.extend(rest)
    return out


def _ranges_count(ranges: list) -> int:
    return sum(hi - lo + 1 for lo, hi in ranges)


def _normalize_snap(snap: dict) -> dict:
    """Upgrade pre-round-2 snapshot layouts in place:
    - deltas: [[paths]] → [{"files": [...], "rows": None}]
    - l1:     {b: [paths]} → {b: {"files": [...], "rows": None}}
    - applied: ["job::batch"] → {job: [[lo, hi], ...]}
    - bucket keys "r" → modulus-qualified "m:r" (m = snapshot n_buckets)
    Unknown row counts push reads to the conservative full-resolve tier.
    """
    m = snap.get("n_buckets", 64)
    for field_name in ("buckets", "l1"):
        mp = snap.get(field_name)
        if mp and any(":" not in k for k in mp):
            snap[field_name] = {
                (k if ":" in k else _bkey(m, int(k))): v for k, v in mp.items()
            }
    for field_name in ("buckets_ref", "l1_ref"):
        mp = snap.get(field_name)
        if mp and any(":" not in k for k in mp):
            snap[field_name] = {
                (k if ":" in k else _bkey(m, int(k))): v for k, v in mp.items()
            }
    snap.setdefault("manifest_spill", [])
    # pre-round-5 spill entries are bare rel paths; upgrade to
    # version-indexed entries so changes_between can prune FILES
    sp = snap["manifest_spill"]
    if sp and isinstance(sp[0], str):
        snap["manifest_spill"] = [
            {"path": p, "v_min": None, "v_max": None} for p in sp
        ]
    snap.setdefault("superseded", {})
    snap.setdefault("renames", {})
    snap.setdefault("markers", [])  # cascade equality-delete markers
    snap.setdefault("base_rows", None)  # legacy: unknown → no cost model
    # pre-round-3 snapshots carry buckets/l1 lists inline (no refs)
    snap.setdefault("buckets_ref", None)
    snap.setdefault("l1_ref", None)
    deltas = snap.get("deltas", [])
    if deltas and isinstance(deltas[0], list):
        snap["deltas"] = [{"files": ps, "rows": None} for ps in deltas]
    l1 = snap.get("l1", {})
    if l1 and isinstance(next(iter(l1.values())), list):
        snap["l1"] = {b: {"files": ps, "rows": None} for b, ps in l1.items()}
    applied = snap.get("applied", [])
    if isinstance(applied, list):
        by_job: dict[str, list] = {}
        for key in applied:
            job, _, bid = key.rpartition("::")
            by_job.setdefault(job, [])
            by_job[job] = _ranges_add(by_job[job], int(bid))
        snap["applied"] = by_job
    return snap


def _resolve_filelists(path: str, snap: dict, fs: MetaFS | None = None) -> dict:
    """Inflate the in-memory ``buckets``/``l1`` maps from their sidecar
    refs (the on-disk snapshot stores only refs).  Pre-round-3 snapshots
    carry the lists inline and pass through unchanged.  Cost: one small
    JSON read per DISTINCT sidecar referenced — bounded by the number of
    compactions whose output is still partially live (typically a
    handful; worst case one per bucket), the same two-level open cost as
    Iceberg's manifest list."""
    brefs, lrefs = snap.get("buckets_ref"), snap.get("l1_ref")
    if brefs is None and lrefs is None:
        return snap
    if fs is None:
        fs = LocalMetaFS()
    cache: dict[str, dict] = {}

    def side(rel: str) -> dict:
        if rel not in cache:
            cache[rel] = json.loads(fs.read_text(os.path.join(path, rel)))
        return cache[rel]

    snap["buckets"] = {
        b: side(rel)["buckets"][b] for b, rel in (brefs or {}).items()
    }
    snap["l1"] = {b: side(rel)["l1"][b] for b, rel in (lrefs or {}).items()}
    return snap


class LakehouseTable:
    """Handle to one merge-on-read table rooted at ``path``."""

    def __init__(self, spark: SparkSession, path: str, snap: dict,
                 meta_fs: MetaFS | None = None):
        self.spark = spark
        self.path = path
        # control-plane FS (snapshots / sidecars / CAS) — see metafs.py;
        # data files always go through Spark's Hadoop FS layer
        self.fs = meta_fs or LocalMetaFS()
        self._snap = _resolve_filelists(path, _normalize_snap(snap), self.fs)

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        n_buckets: int | None = 64,
        max_deltas: int = 8,
        expected_rows: int | None = None,
        bucket_expr: str = "doc_id",
        meta_fs: MetaFS | None = None,
    ) -> "LakehouseTable":
        """CREATE TABLE IF NOT EXISTS (SURVEY §2.1 S6).  Pass
        ``expected_rows`` (with ``n_buckets=None``) to size the bucket
        count from expected volume via ``suggest_n_buckets`` — under-
        sized tables can later be re-granulated with ``split_buckets``
        without rewriting data."""
        if n_buckets is None:
            n_buckets = (
                suggest_n_buckets(expected_rows) if expected_rows else 64
            )
        fs = meta_fs or LocalMetaFS()
        snap_dir = os.path.join(path, _SNAP_DIR)
        if _latest_version(snap_dir, fs) is not None:
            return cls.load(spark, path, meta_fs=fs)
        fs.makedirs(snap_dir)
        fs.makedirs(os.path.join(path, _DATA_DIR))
        snap = {
            "version": 0,
            "n_buckets": n_buckets,
            "bucket_expr": bucket_expr,
            "max_deltas": max_deltas,  # L0 commit cap (and L1 per-bucket cap)
            # Leveled layout (LSM-style; Iceberg analog: data files +
            # positional deltas + rewrite_data_files):
            #   L0 "deltas":  [{"files": [...], "rows": n}, …] — one entry
            #     per ingest commit, UNBUCKETED (written straight out of
            #     the dedup shuffle: zero extra shuffle on the hot path);
            #     "rows" feeds the tiered-read plan choice
            #   L1 "l1":      bucket(str) → {"files": [...], "rows": n} —
            #     bucket-pure, resolved folds of L0 (cost O(L0) every
            #     max_deltas commits, independent of table size)
            #   base "buckets": bucket(str) → [rel paths] — bucket-pure,
            #     fully resolved; rebuilt bucket-locally when a bucket's
            #     L1 count hits its (staggered) cap — cost O(bucket),
            #     never O(table)
            "buckets": {},
            "base_rows": 0,  # exact base row count (parquet footers)
            "l1": {},
            "deltas": [],
            # evolved value columns beyond TARGET_SCHEMA: [[name, ddl], …]
            # (Iceberg schema-evolution analog: add-column + widen; rename
            # via the "renames" physical→logical map)
            "extra_columns": [],
            "renames": {},
            # {job_id: [[batch_lo, batch_hi], …]} — compressed applied set
            "applied": {},
            "manifests": [],  # retained tail, rows per MANIFEST_SCHEMA
            "manifest_spill": [],  # [{path, v_min, v_max}] spill sidecars
            "watermark": -1,  # highest seq_to applied
            # per-bucket file-list sidecar refs ({} = ref-based layout;
            # the on-disk snapshot never inlines buckets/l1 lists)
            "buckets_ref": {},
            "l1_ref": {},
        }
        _commit_snapshot(snap_dir, snap, fs)
        return cls(spark, path, snap, meta_fs=fs)

    @classmethod
    def load(
        cls, spark: SparkSession, path: str, version: int | None = None,
        meta_fs: MetaFS | None = None,
    ) -> "LakehouseTable":
        """Open the table at the latest snapshot, or TIME-TRAVEL to an
        older retained ``version`` (Iceberg `VERSION AS OF` analog —
        snapshots are immutable JSON files, so a point-in-time handle is
        a plain read of that file; its data files remain valid until a
        vacuum below the retention window removes superseded ones)."""
        fs = meta_fs or LocalMetaFS()
        snap_dir = os.path.join(path, _SNAP_DIR)
        if version is None:
            version = _latest_version(snap_dir, fs)
            if version is None:
                raise FileNotFoundError(f"no snapshots under {snap_dir}")
        snap_file = os.path.join(snap_dir, _snap_name(version))
        if not fs.exists(snap_file):
            raise FileNotFoundError(
                f"snapshot v{version} not found under {snap_dir}"
            )
        return cls(spark, path, json.loads(fs.read_text(snap_file)),
                   meta_fs=fs)

    def history(self, limit: int | None = None) -> list[dict]:
        """Retained snapshots, oldest first: version, commit summary —
        the Iceberg `table.history()` analog, driver-side metadata only.
        ``limit`` bounds the walk to the NEWEST N snapshots (the listing
        is names-only; JSON reads are O(limit), so a 10^5-commit table
        answers `history --limit 20` without reading 10^5 files)."""
        snap_dir = os.path.join(self.path, _SNAP_DIR)
        names = sorted(
            fn for fn in self.fs.listdir(snap_dir)
            if fn.startswith("v") and fn.endswith(".json")
        )
        if limit is not None:
            if limit < 0:  # ADVICE r5: names[-limit:] would DROP the
                raise ValueError(  # |limit| oldest instead of newest N
                    f"history limit must be >= 0, got {limit}"
                )
            names = names[-limit:] if limit > 0 else []
        out = []
        for fn in names:
            s = _normalize_snap(
                json.loads(self.fs.read_text(os.path.join(snap_dir, fn)))
            )
            last = s["manifests"][-1] if s["manifests"] else None
            out.append({
                "version": s["version"],
                "watermark": s["watermark"],
                "base_rows": s.get("base_rows"),
                "pending_commits": len(s["deltas"]),
                "committed_at": last["committed_at"] if last else None,
                "job_id": last["job_id"] if last else None,
                "batch_id": last["batch_id"] if last else None,
            })
        return out

    def changes_between(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental change feed (Iceberg incremental-scan / CDC-out
        analog): the RAW change rows (including tombstones, ``_deleted``
        marking deletes) applied by commits with
        ``from_version < snapshot_version <= to_version``, read straight
        from those commits' delta files — downstream consumers tail the
        lakehouse without replaying the source log.  Window of validity:
        delta files persist until compaction supersedes them AND vacuum
        reclaims them past the grace window; a closed window raises."""
        if to_version is None:
            to_version = self.version
        # filter BEFORE collect: the driver receives O(window) manifest
        # rows, not O(commits) — the predicate pushes into the spill
        # parquet scan, so a 10^5-commit table pays for the rows it
        # asked about (VERDICT r3 minor-#4)
        rows = [
            m
            for m in self.manifests_df(from_version, to_version)
            .where(
                (F.col("snapshot_version") > from_version)
                & (F.col("snapshot_version") <= to_version)
            )
            .select("snapshot_version", "delta_files")
            .collect()
            if m["delta_files"]
        ]
        files = [p for m in rows for p in m["delta_files"]]
        missing = [
            p for p in files
            if not self.fs.exists(os.path.join(self.path, p))
        ]
        if missing:
            raise FileNotFoundError(
                f"incremental window closed: {len(missing)} delta file(s) "
                f"vacuumed (e.g. {missing[0]}); re-read from the source log"
            )
        return self._raw(self._abs(files))

    def refresh(self) -> "LakehouseTable":
        return LakehouseTable.load(self.spark, self.path, meta_fs=self.fs)

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------
    @property
    def n_buckets(self) -> int:
        return self._snap["n_buckets"]

    @property
    def bucket_expr(self) -> str:
        return self._snap.get("bucket_expr", "doc_id")

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
        return _ranges_contains(self._snap["applied"].get(job_id, []), batch_id)

    def applied_count(self) -> int:
        return sum(_ranges_count(r) for r in self._snap["applied"].values())

    def _abs(self, rels: list[str]) -> list[str]:
        return [os.path.join(self.path, r) for r in rels]

    @property
    def extra_columns(self) -> list:
        return [tuple(e) for e in self._snap.get("extra_columns", [])]

    @property
    def renames(self) -> dict:
        """physical (as-written) column name → current logical name."""
        return dict(self._snap.get("renames", {}))

    def _raw(self, files: list[str], extras: list | None = None) -> DataFrame:
        """Read data files with the physical schema (delta files carry an
        extra _n_events column; base files don't — permissive schema;
        files older than an evolved column backfill nulls; files written
        under a pre-rename physical name coalesce into the logical
        column; files with a pre-widen narrower type up-cast at scan)."""
        if extras is None:
            extras = self.extra_columns
        renames = self.renames
        if not files:
            schema = _read_schema(extras=extras).add(
                StructField("_bucket", IntegerType(), False)
            )
            return self.spark.createDataFrame([], schema)
        # physical read schema: logical extras + any renamed-away
        # physical columns (same ddl as their logical target)
        ddl_of = dict(extras)
        phys_extras = list(extras) + [
            (old, ddl_of[new]) for old, new in renames.items() if new in ddl_of
        ]
        cols = [F.col(f.name) for f in TARGET_SCHEMA.fields]
        for n, _ in extras:
            olds = sorted(o for o, nn in renames.items() if nn == n)
            cols.append(
                F.coalesce(F.col(n), *[F.col(o) for o in olds]).alias(n)
                if olds
                else F.col(n)
            )
        return (
            self.spark.read.schema(
                _read_schema(extra_n_events=True, extras=phys_extras)
            )
            .parquet(*files)
            .select(*cols)
            .withColumn("_bucket", _bucket_col(self.bucket_expr, self.n_buckets))
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

    def _pending(
        self, buckets=None, snap: dict | None = None
    ) -> tuple[list[str], int | None]:
        """(files, rows) of L0+L1 not yet folded into base.  rows is None
        when any entry predates row tracking (→ conservative tier 3).

        ``snap`` lets callers pin ONE snapshot dict for the whole read:
        read()/scan_raw() run in pool workers concurrent with the
        runner thread swapping self._snap in commit_delta, and reading
        buckets from one snapshot but l1/deltas from a newer one would
        drop the rows a fold just moved L0/L1→base (torn view).  File
        lists inside a captured snapshot are immutable — vacuum/expire
        never run mid-job — so a single reference is race-free."""
        if snap is None:
            snap = self._snap
        l1 = snap.get("l1", {})
        files: list[str] = []
        rows: int | None = 0
        if buckets is None:
            l1_keys = list(l1)
        else:
            residues = {int(b) for b in buckets}
            l1_keys = [
                k for k in l1 if _key_matches_residues(k, residues)
            ]
        for k in l1_keys:
            e = l1.get(k)
            if not e:
                continue
            files.extend(e["files"])
            rows = None if (rows is None or e["rows"] is None) else rows + e["rows"]
        for e in snap["deltas"]:
            files.extend(e["files"])
            rows = None if (rows is None or e["rows"] is None) else rows + e["rows"]
        return files, rows

    def read(
        self,
        buckets=None,
        include_deleted: bool = False,
        tier: int | None = None,
        columns: list[str] | None = None,
    ) -> DataFrame:
        """Current table state (optionally restricted to buckets) —
        tiered MoR resolve, see the module docstring §3.  Base files are
        bucket-pure and one-row-per-key on disk; the pending (L0+L1) and
        base row counts in the snapshot pick the plan without running a
        job: the merge tiers only pay off when base ≫ pending (cost
        model above BASE_OVER_PENDING_MIN) — on a small or delta-heavy
        table the plain resolve is both simpler and faster.  ``tier``
        overrides the choice (diagnostics/tests).  Tombstones filtered
        unless ``include_deleted``.

        ``columns`` projects the read BEFORE the LWW resolve: the
        winner per key is decided by (_commit_seq, _deleted, _row_id)
        alone, so dropping payload columns above the scan cannot change
        which row wins — and Catalyst pushes the narrowed projection
        into the parquet ReadSchema, so a key/metadata consumer (e.g.
        the cascade-delete candidate lookup) never reads the token
        arrays at all (~10× less I/O on this table's row shape).
        System columns needed by the resolve/tombstone filter are kept
        automatically."""
        snap = self._snap  # pin ONE snapshot — see _pending docstring
        bm = snap["buckets"]
        if buckets is None:
            keys = list(bm)
        else:
            residues = {int(b) for b in buckets}
            keys = [k for k in bm if _key_matches_residues(k, residues)]
        base_files = [p for k in keys for p in bm.get(k, [])]
        pend_files, pend_rows = self._pending(buckets, snap=snap)
        base_rows = snap.get("base_rows")

        def _bucket_filter(df: DataFrame) -> DataFrame:
            if buckets is not None:
                df = df.where(
                    F.col("_bucket").isin([int(b) for b in buckets])
                )
            return _project(df)

        def _project(df: DataFrame) -> DataFrame:
            if columns is None:
                return df
            keep = list(dict.fromkeys(
                [*columns, "doc_id", "_commit_seq", "_deleted", "_row_id",
                 # marker application joins on parent_doc_id post-resolve
                 *(["parent_doc_id"] if snap.get("markers") else [])]
            ))
            return df.select(*[c for c in keep if c in df.columns])

        # base entries written under an older (coarser) modulus contain
        # sibling residues too — filter them out; entries at the current
        # modulus are bucket-pure and skip the predicate entirely
        mixed = any(_bkey_parse(k)[0] != snap["n_buckets"] for k in keys)

        def _base_filter(df: DataFrame) -> DataFrame:
            return _bucket_filter(df) if mixed else _project(df)

        if not pend_files:
            # base is one-row-per-key on disk already
            out = _base_filter(self._raw(self._abs(base_files)))
        elif not base_files:
            out = self._resolve(_bucket_filter(self._raw(self._abs(pend_files))))
        else:
            if tier is None:
                if pend_rows is None or base_rows is None:
                    tier = 3  # legacy/unknown metadata: conservative
                elif (
                    base_rows < BASE_OVER_PENDING_MIN * pend_rows
                    or base_rows < BASE_ROWS_MIN_MERGE
                ):
                    tier = 3  # small base: shuffle-all is the cheap plan
                elif pend_rows <= BROADCAST_KEYS_T2:
                    tier = 2  # default merge path (measured fastest)
                else:
                    tier = 3  # writer outran compaction by >20M keys
            if tier == 1 and (
                pend_rows is None or pend_rows > BROADCAST_ROWS_T1
            ):
                # tier 1 broadcasts FULL resolved rows; above the cap (or
                # with unknown counts) that can OOM the driver/executors —
                # enforce the documented bound by degrading to the
                # key-broadcast tier (or the full resolve when even the
                # key count is unknown).  (ADVICE.md)
                tier = 2 if pend_rows is not None else 3
            if tier == 1:
                out = self._read_merge_t1(
                    _base_filter(self._raw(self._abs(base_files))),
                    _bucket_filter(self._raw(self._abs(pend_files))),
                )
            elif tier == 2:
                out = self._read_merge_t2(
                    _base_filter(self._raw(self._abs(base_files))),
                    _bucket_filter(self._raw(self._abs(pend_files))),
                )
            else:
                # one combined parquet relation (not a union of two):
                # ~20% faster scan; the bucket filter is a no-op on the
                # path-pruned base rows and prunes unbucketed L0 rows
                out = self._resolve(
                    _bucket_filter(self._raw(self._abs(base_files + pend_files)))
                )
        # cascade equality-delete markers (opt-in mode): fold the marker
        # set into _deleted on the resolved winners — a no-op join-free
        # pass-through when the snapshot carries no markers (default)
        out = self._apply_markers(out, snap)
        if not include_deleted:
            out = out.where(~F.col("_deleted"))
        return out

    def scan_raw(
        self, buckets=None, columns: list[str] | None = None
    ) -> DataFrame:
        """UNRESOLVED row multiset (base ∪ L1 ∪ L0): every stored
        version of every key, bucket-pruned and column-projected, with
        NO LWW resolve — the plan is just the (narrowed) parquet scan,
        zero shuffle.  For consumers whose downstream semantics are
        LWW-idempotent this is strictly cheaper than read(): the
        cascade-delete candidate lookup is the canonical case — a
        tombstone emitted at del_seq only takes effect where it is the
        newest version of that key (stale for re-inserted or
        forced-replay-newer children), so blanket-tombstoning every
        historical child key converges to exactly the resolved-lookup
        state while the lookup itself never exchanges a row."""
        snap = self._snap  # pin ONE snapshot — see _pending docstring
        bm = snap["buckets"]
        if buckets is None:
            keys = list(bm)
        else:
            residues = {int(b) for b in buckets}
            keys = [k for k in bm if _key_matches_residues(k, residues)]
        files = [p for k in keys for p in bm.get(k, [])]
        pend_files, _ = self._pending(buckets, snap=snap)
        df = self._raw(self._abs(files + pend_files))
        if buckets is not None:
            # prunes sibling residues in coarser-modulus base entries
            # and the unbucketed L0 rows
            df = df.where(F.col("_bucket").isin([int(b) for b in buckets]))
        if columns is not None:
            keep = list(dict.fromkeys(
                [*columns, "doc_id", "_commit_seq", "_deleted", "_row_id"]
            ))
            df = df.select(*[c for c in keep if c in df.columns])
        return df

    def _read_merge_t1(self, base: DataFrame, pending: DataFrame) -> DataFrame:
        """Tier-1 read: broadcast the RESOLVED delta (full rows) and
        LEFT-join it onto base with an inline LWW struct comparison.
        Base is scanned once full-width and once doc_id-only (insert
        detection); neither scan shuffles.

        The resolve(pending) subtree appears three times below (merge
        broadcast, insert-probe broadcast, insert anti-join) and
        ReuseExchange can NOT dedupe it — the consumers need different
        exchange kinds (Broadcast vs Shuffle), so without intervention
        the O(pending) resolve executes 3×.  localCheckpoint
        materializes it ONCE as executor-memory blocks (eager: the job
        runs here); all three consumers then scan the checkpointed RDD.
        Block lifetime = this DataFrame's lifetime (ContextCleaner frees
        them on GC), and size is bounded by the tier-1 admission cap
        (BROADCAST_ROWS_T1 full rows) enforced in read()."""
        d = self._resolve(pending).localCheckpoint(eager=True)
        cols = [c for c in base.columns if c != "doc_id"]
        d2 = F.broadcast(
            d.select(
                F.col("doc_id").alias("__k"),
                *[F.col(c).alias(f"__d_{c}") for c in cols],
            )
        )
        j = base.join(d2, base["doc_id"] == F.col("__k"), "left")
        d_wins = F.col("__k").isNotNull() & (
            F.struct(
                F.col("__d__commit_seq"),
                F.col("__d__deleted").cast("int"),
                F.col("__d__row_id"),
            )
            > F.struct(
                F.col("_commit_seq"),
                F.col("_deleted").cast("int"),
                F.col("_row_id"),
            )
        )
        merged = j.select(
            "doc_id",
            *[
                F.when(d_wins, F.col(f"__d_{c}")).otherwise(F.col(c)).alias(c)
                for c in cols
            ],
        )
        # delta keys absent from base = inserts; the base probe here is
        # column-pruned to doc_id only (cheap scan, still no exchange)
        in_base = base.select("doc_id").join(
            F.broadcast(d.select("doc_id")), "doc_id", "left_semi"
        )
        d_new = d.join(in_base, "doc_id", "left_anti")
        return merged.unionByName(d_new.select(*merged.columns))

    def _read_merge_t2(self, base: DataFrame, pending: DataFrame) -> DataFrame:
        """Tier-2 read: broadcast only the pending KEY SET; base splits
        into untouched (anti) / touched (semi) streams — two full-width
        base scans, zero base exchange; the resolve shuffles only
        touched ∪ pending = O(pending)."""
        pkeys = F.broadcast(pending.select("doc_id").distinct())
        untouched = base.join(pkeys, "doc_id", "left_anti")
        touched = base.join(pkeys, "doc_id", "left_semi")
        winners = self._resolve(touched.unionByName(pending))
        return untouched.unionByName(winners.select(*untouched.columns))

    def manifests_df(
        self,
        from_version: int | None = None,
        to_version: int | None = None,
    ) -> DataFrame:
        """All manifest rows: the retained in-snapshot tail plus any
        spilled Parquet sidecars (lineage survives the spill).  Spilled
        rows superseded by a forced re-apply (the replacement landed in
        a later snapshot; sidecars are immutable) are filtered out here
        so (job_id, batch_id) stays unique across the union (ADVICE.md:
        a duplicate row fed stale delta files to changes_between and
        double-counted lineage).

        ``from_version``/``to_version`` (exclusive/inclusive, matching
        changes_between) PRUNE whole sidecars by their recorded
        [v_min, v_max] index before any file opens — the caller must
        still row-filter, this only guarantees every in-window row is
        present.  Legacy entries without a range are always read."""
        tail = self.spark.createDataFrame(self._snap["manifests"], MANIFEST_SCHEMA)
        spill = self._snap.get("manifest_spill", [])
        if from_version is not None or to_version is not None:
            spill = [
                e for e in spill
                if e.get("v_min") is None
                or e.get("v_max") is None
                or (
                    (to_version is None or e["v_min"] <= to_version)
                    and (from_version is None or e["v_max"] > from_version)
                )
            ]
        if not spill:
            return tail
        spilled = self.spark.read.schema(MANIFEST_SCHEMA).parquet(
            *self._abs([e["path"] for e in spill])
        )
        superseded = self._snap.get("superseded", {})
        if superseded:
            cond = None
            for key, version in superseded.items():
                job, _, bid = key.rpartition("::")
                stale = (
                    (F.col("job_id") == job)
                    & (F.col("batch_id") == int(bid))
                    & (F.col("snapshot_version") < int(version))
                )
                cond = stale if cond is None else (cond | stale)
            spilled = spilled.where(~cond)
        return spilled.unionByName(tail)

    def _find_manifest(self, job_id: str, batch_id: int) -> dict | None:
        """Latest manifest row for (job_id, batch_id): tail first (newest
        last — forced re-applies resolve to the LATEST row, ADVICE.md),
        then the spilled sidecars."""
        for m in reversed(self._snap["manifests"]):
            if m["job_id"] == job_id and m["batch_id"] == batch_id:
                return m
        if self._snap.get("manifest_spill"):
            rows = (
                self.manifests_df()
                .where(
                    (F.col("job_id") == job_id) & (F.col("batch_id") == batch_id)
                )
                .collect()
            )
            if rows:
                return rows[-1].asDict(recursive=True)
        return None

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
        markers_delta: dict | None = None,
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
            return self._find_manifest(job_id, batch_id)
        prepared = self.prepare_delta(updates, job_id, batch_id)
        if markers_delta is not None:
            # cascade equality-delete markers (opt-in mode) ride the
            # same atomic commit — see prepare_markers
            prepared["markers_delta"] = markers_delta
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

    def prepare_markers(self, dels) -> dict | None:
        """Write a cascade equality-delete MARKER delta — the opt-in
        alternative to eager child tombstones (BENCH/BASELINE.md r4:
        markers move the candidate join off the ingest path at the cost
        of the CDC-out feed no longer carrying cascade-deleted children;
        that trade-off is why the mode is opt-in).  ``dels`` is
        (p, del_seq, del_source): a LIST of tuples (the runner's
        collected sparse path — written driver-side via pyarrow, ZERO
        Spark jobs, like the manifest spill) or a DataFrame (the
        MASS_DELETE path — distributed write; no coalesce: a single
        serial task re-evaluating a driver-parallelized parent costs
        seconds, measured 4.5 s vs 1.5 s for 5k rows).  Stateless like
        prepare_delta; the returned {"files", "rows"} entry rides a
        prepared dict as ``markers_delta`` into the batch's atomic
        commit.  Returns None for a delete-free batch."""
        rel = os.path.join(_DATA_DIR, f"markers-{uuid.uuid4().hex}")
        absdir = os.path.join(self.path, rel)
        if not isinstance(dels, DataFrame):
            rows = list(dels)
            if not rows:
                return None
            import pyarrow as pa
            import pyarrow.parquet as pq

            os.makedirs(absdir, exist_ok=True)
            tbl = pa.table({
                "p": pa.array([str(r[0]) for r in rows], pa.string()),
                "del_seq": pa.array([int(r[1]) for r in rows], pa.int64()),
                "del_source": pa.array(
                    [None if r[2] is None else str(r[2]) for r in rows],
                    pa.string(),
                ),
            })
            f = os.path.join(absdir, "markers.parquet")
            pq.write_table(tbl, f)
            return {"files": [os.path.relpath(f, self.path)],
                    "rows": len(rows)}
        from pyspark.sql import Observation

        obs = Observation(f"markers-{uuid.uuid4().hex[:8]}")
        rows_df = dels.select(
            F.col("p").cast("string"),
            F.col("del_seq").cast("long"),
            F.col("del_source").cast("string"),
        ).observe(obs, F.count(F.lit(1)).alias("n"))
        rows_df.write.mode("overwrite").parquet(absdir)
        n = int(obs.get["n"] or 0)
        if n == 0:
            import shutil

            shutil.rmtree(absdir, ignore_errors=True)
            return None
        return {"files": _list_parquet_files(absdir, self.path), "rows": n}

    def _marker_map(self, snap: dict) -> DataFrame | None:
        """(p, _mseq) — max marker seq per parent, or None when the
        pinned snapshot carries no markers.  A child row is marker-dead
        iff its WINNING ``_commit_seq`` < the parent's ``_mseq``
        (re-inserts after the delete outrank every earlier marker, so
        the per-parent max is exact).  Broadcast below the row bound —
        markers are per parent-DELETE, not per child, so the map stays
        small relative to the table."""
        entries = snap.get("markers", [])
        if not entries:
            return None
        files = [p for e in entries for p in e["files"]]
        mk = (
            self.spark.read.parquet(*self._abs(files))
            .groupBy("p")
            .agg(F.max("del_seq").alias("_mseq"))
        )
        total = sum(e["rows"] or 0 for e in entries)
        if total <= MARKER_BROADCAST_ROWS:
            mk = F.broadcast(mk)
        return mk

    def _apply_markers(self, out: DataFrame, snap: dict) -> DataFrame:
        """Fold the marker set into ``_deleted`` on resolved winners.
        No-op without markers; rows whose table lacks ``parent_doc_id``
        cannot be cascade children and pass through."""
        mk = self._marker_map(snap)
        if mk is None or "parent_doc_id" not in out.columns:
            return out
        return (
            out.join(mk, out["parent_doc_id"] == mk["p"], "left")
            .withColumn(
                "_deleted",
                F.col("_deleted")
                | (F.col("_mseq").isNotNull()
                   & (F.col("_commit_seq") < F.col("_mseq"))),
            )
            .drop("p", "_mseq")
        )

    def materialize_markers(self) -> int:
        """Maintenance: convert accumulated cascade markers into real
        child tombstones in ONE amortized pass (the candidate join every
        eager delete batch pays, paid once for ALL markers), then clear
        the marker list in the same atomic commit.  After this the table
        is state-equivalent to eager-cascade mode and CDC-out carries
        the materialized deletes (late — at materialize time, not delete
        time; the mode's documented trade-off).  Returns the number of
        distinct parents materialized."""
        snap = self._snap  # pin ONE snapshot — see _pending docstring
        entries = snap.get("markers", [])
        if not entries:
            return 0
        files = [p for e in entries for p in e["files"]]
        mk = (
            self.spark.read.parquet(*self._abs(files))
            .groupBy("p")
            .agg(
                F.max("del_seq").alias("del_seq"),
                F.max_by("del_source", "del_seq").alias("del_source"),
            )
        )
        total = sum(e["rows"] or 0 for e in entries)
        if total <= MARKER_BROADCAST_ROWS:
            mk = F.broadcast(mk)
        cand = self.scan_raw(
            columns=["doc_id", "kind", "array_index", "parent_doc_id"]
        )
        if "parent_doc_id" not in cand.columns:
            raise ValueError(
                "markers present but table has no parent_doc_id column"
            )
        # blanket tombstones over every historical child key, exactly
        # the eager phase-A shape: LWW-idempotent, duplicates settle at
        # read-resolve, a re-insert newer than del_seq outranks them.
        upd = (
            cand.join(mk, cand["parent_doc_id"] == mk["p"])
            .select(
                "doc_id",
                F.lit("D").alias("op"),
                F.lit(None).cast("array<int>").alias("tokens"),
                F.lit(None).cast("int").alias("n_tok"),
                F.col("del_source").alias("source"),
                F.col("del_seq").alias("commit_seq"),
                "kind",
                "array_index",
                "parent_doc_id",
            )
            .dropDuplicates(["doc_id"])
        )
        prepared = self.prepare_delta(upd, "_markers", snap["version"])
        # clear exactly the entries this pass materialized; markers
        # committed concurrently survive for the next pass
        prepared["clear_markers"] = [p for e in entries for p in e["files"]]
        self.commit_delta(prepared, "_markers", snap["version"])
        n = (
            self.spark.read.parquet(*self._abs(files))
            .select("p").distinct().count()
        )
        return int(n)

    @staticmethod
    def merge_prepared(a: dict, b: dict) -> dict:
        """Fuse two prepared deltas into ONE commit unit (files + merged
        stats) so they publish in a single atomic snapshot swap — used
        by the runner's two-phase cascade deletes, where the batch's
        main delta is prepared in the pipeline and a small gap-tombstone
        delta is prepared at commit time.  Every stat is a sum/min/max
        of per-row quantities, so merging is exact: verify_batch
        recomputes Σ hash over ALL delta_files, matching dh_a + dh_b.

        A ZERO-ROW delta counts as empty even when it carries files:
        Spark writes a schema-only parquet part for an empty DataFrame,
        so prepare_delta can return files non-empty with stats
        {n: 0, lo: None, ...} (e.g. a phase-B gap join with no matching
        children).  Merging those None stats into min()/max() would
        TypeError — treat the side as absent instead."""

        def _empty(p: dict) -> bool:
            st = p.get("stats")
            return not p.get("files") or st is None or not st.get("n")

        if _empty(b):
            return a
        if _empty(a):
            return b
        sa, sb = a["stats"], b["stats"]
        has_counts = a["has_counts"] and b["has_counts"]
        ne = (
            (sa.get("ne") or 0) + (sb.get("ne") or 0)
            if has_counts and sa.get("ne") is not None
            and sb.get("ne") is not None
            else None
        )
        stats = {
            "n": sa["n"] + sb["n"],
            "d": (sa["d"] or 0) + (sb["d"] or 0),
            "lo": min(sa["lo"], sb["lo"]),
            "hi": max(sa["hi"], sb["hi"]),
            "smin": min(sa["smin"], sb["smin"]),
            "smax": max(sa["smax"], sb["smax"]),
            "dh": (sa["dh"] or 0) + (sb["dh"] or 0),
            "ne": ne,
        }
        extras = list(a.get("extras", []))
        seen = set(map(tuple, extras))
        for e in b.get("extras", []):
            if tuple(e) not in seen:
                extras.append(e)
                seen.add(tuple(e))
        return {
            "files": list(a["files"]) + list(b["files"]),
            "stats": stats,
            "has_counts": has_counts,
            "extras": extras,
        }

    def commit_delta(
        self,
        prepared: dict,
        job_id: str,
        batch_id: int,
        seq_from: int | None = None,
        seq_to: int | None = None,
        events_read: int | None = None,
        force: bool = False,
        conflict_retries: int = 5,
    ) -> dict:
        """Publish a prepared delta: manifest + (maybe) compaction + the
        atomic snapshot swap.  Must be called in batch order within a
        job.  On a snapshot CONFLICT (another writer published first) the
        commit refreshes the snapshot and retries with bounded backoff —
        the mutation (delta list, compaction choice, version) is
        recomputed against the new state, so concurrent jobs interleave
        hands-free; ``conflict_retries=0`` restores fail-fast."""
        attempt = 0
        while True:
            try:
                return self._commit_delta_once(
                    prepared, job_id, batch_id, seq_from, seq_to,
                    events_read, force,
                )
            except SnapshotConflict:
                if attempt >= conflict_retries:
                    raise
                time.sleep(min(0.05 * (2 ** attempt), 1.0))
                attempt += 1
                self._snap = self.refresh()._snap

    def _commit_delta_once(
        self,
        prepared: dict,
        job_id: str,
        batch_id: int,
        seq_from: int | None,
        seq_to: int | None,
        events_read: int | None,
        force: bool,
    ) -> dict:
        if self.is_applied(job_id, batch_id) and not force:
            return self._find_manifest(job_id, batch_id)
        # cascade equality-delete markers (opt-in, SURVEY M3 alternate):
        # a marker delta rides the batch's atomic commit exactly like
        # data files; materialize_markers clears the accumulated list.
        markers: list | None = None
        if prepared.get("markers_delta") and prepared.get("clear_markers"):
            # ADVICE r5: a prepared dict carrying BOTH would have the
            # clear branch rebuild the list from self._snap and silently
            # drop the markers_delta addition.  No caller produces this
            # combination; fail loudly instead of mis-merging.
            raise ValueError(
                "prepared dict carries both markers_delta and "
                "clear_markers; these commit paths are mutually exclusive"
            )
        if prepared.get("markers_delta"):
            markers = (
                self._snap.get("markers", []) + [prepared["markers_delta"]]
            )
        if prepared.get("clear_markers"):
            # clear ONLY the entries the caller materialized (by path):
            # a marker batch that committed concurrently between the
            # materialize pin and this publish keeps its markers —
            # wiping the whole list would silently drop its cascade
            # deletes.  (The commit_delta conflict-retry loop re-reads
            # self._snap, so this subtraction sees the latest list.)
            done = set(prepared["clear_markers"])
            markers = [
                e for e in self._snap.get("markers", [])
                if not set(e["files"]) <= done
            ]
        stats = prepared["stats"]
        if stats is None or stats["n"] == 0:
            return self._commit_noop(job_id, batch_id, seq_from, seq_to,
                                     events_read, markers=markers)
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

        # register evolved columns: add-only, plus WIDEN (int→long,
        # float→double — old files up-cast at scan, Spark 4 readers);
        # other type changes rejected.  Incoming names are logical
        # (post-rename) names.
        extra_cols = [list(e) for e in self._snap.get("extra_columns", [])]
        known = {n: d for n, d in extra_cols}
        for n, d in prepared.get("extras", []):
            if n in known:
                if known[n] == d:
                    continue
                if d in _WIDEN_OK.get(known[n], ()):  # widen registered type
                    for e in extra_cols:
                        if e[0] == n:
                            e[1] = d
                    known[n] = d
                elif known[n] in _WIDEN_OK.get(d, ()):
                    pass  # batch narrower than table: files up-cast at read
                else:
                    raise ValueError(
                        f"schema evolution conflict on column {n!r}: "
                        f"table has {known[n]}, batch has {d}"
                    )
            else:
                extra_cols.append([n, d])
                known[n] = d

        buckets_map = dict(self._snap["buckets"])
        l1_map = {k: dict(v) for k, v in self._l1.items()}
        deltas = self._snap["deltas"] + [
            {"files": prepared["files"], "rows": int(stats["n"])}
        ]

        new_extras = [tuple(e) for e in extra_cols]
        if len(deltas) >= self.max_deltas:
            buckets_map, l1_map, base_rows = self._fold_and_maybe_major(
                deltas, buckets_map, l1_map, new_extras,
                self._snap.get("base_rows"),
            )
            deltas = []
        else:
            base_rows = self._snap.get("base_rows")

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
        self._commit(
            buckets_map, l1_map, deltas, manifest, extra_cols,
            base_rows=base_rows, markers=markers,
        )
        return manifest

    def verify_batch(self, job_id: str, batch_id: int) -> bool | None:
        """Integrity check (SURVEY §2.1 S2): recompute the manifest's
        order-insensitive content hash from the batch's own delta files.
        Returns None when verification is not applicable — the files
        were compacted away (row-level window closed) or the batch was a
        legitimate no-op/gap commit (data_hash is None by construction,
        see _commit_noop).  False ONLY for an unknown (job_id, batch_id)
        or a real hash mismatch."""
        m = self._find_manifest(job_id, batch_id)
        if m is None:
            return False
        if m.get("data_hash") is None:
            return None  # no-op gap batch: nothing to verify (ADVICE.md)
        files = self._abs(m.get("delta_files") or [])
        if not files or not all(self.fs.exists(f) for f in files):
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
        """Reduce-partition count for bucket-clustered writes: 4× the
        bucket count, NOT min(n_buckets, conf) (round 6, guide §2.5
        "synthetic keys with too few distinct values").  Hashing B
        distinct bucket ids into ≈B partitions stacks buckets on
        colliding reducers while others sit empty — at B=64, p=32 puts
        5 of 64 buckets on one task (a 5× straggler); measured on the
        sf0.1 L0 fold (medians of 3): p=32 3.02 s / 64 2.86 / 128 2.78
        / **256 2.75** / 501 (injective, zero collisions) 3.34 — the
        injective count loses its win to ~440 empty-but-scheduled
        tasks (an explicit repartition opts out of AQE coalescing).
        4× keeps the expected max load ≈2 at any modulus.  A bucket
        never splits across reducers regardless of this count, so
        per-task memory stays bounded by bucket size either way."""
        return 4 * self.n_buckets

    def _write_bucketed(
        self, df: DataFrame, prefix: str, pre_partitioned: bool = False
    ) -> dict[str, list[str]]:
        commit_abs = os.path.join(self.path, _DATA_DIR, f"{prefix}-{uuid.uuid4().hex}")
        if not pre_partitioned:
            df = df.repartition(self._write_partitions(), "_bucket")
        (
            df.write.mode("overwrite")
            .option("parquet.enable.dictionary", "false")
            .partitionBy("_bucket")
            .parquet(commit_abs)
        )
        return {
            _bkey(self.n_buckets, int(b)): ps
            for b, ps in _list_bucket_files(commit_abs, self.path).items()
        }

    def _resolve_bucketed(self, df: DataFrame) -> DataFrame:
        """Single-shuffle resolve + bucket-cluster (VERDICT r2 next-#8):
        repartition on _bucket (the ONE exchange), then group by
        (_bucket, doc_id).  _bucket is a pure function of the bucket
        expr, so the groups are identical to _resolve's — and because
        HashPartitioning(_bucket) satisfies ClusteredDistribution
        (_bucket, doc_id) (partitioning keys ⊆ grouping keys), Catalyst
        plans the aggregate WITHOUT a second exchange.  The two-shuffle
        shape (groupBy doc_id, then repartition _bucket for the write)
        moved the L0 volume over the wire twice; this moves it once.
        Output rows stay physically clustered by _bucket, so the
        partitionBy write that follows emits one file per (task, bucket)
        with no further movement — pass pre_partitioned=True."""
        cols = df.columns
        ordering = F.struct(
            F.col("_commit_seq").alias("_s"),
            F.col("_deleted").cast("int").alias("_d"),
            F.col("_row_id").alias("_r"),
        )
        winner = F.max_by(F.struct(*[F.col(c) for c in cols]), ordering).alias("w")
        return (
            df.repartition(self._write_partitions(), "_bucket")
            .groupBy("_bucket", "doc_id")
            .agg(winner)
            .select("w.*")
        )

    def _fold_and_maybe_major(
        self,
        deltas: list,
        buckets_map: dict,
        l1_map: dict,
        new_extras: list,
        base_rows: int | None,
    ) -> tuple[dict, dict, int | None]:
        """L0 → L1 fold + the bucket-local major-compaction check —
        the shared tail of a fold-triggering batch commit and the
        explicit ``fold_pending`` maintenance op.  Mutates and returns
        (buckets_map, l1_map, base_rows); the caller owns publishing.

        Fold: resolve + bucket the pending commits.  Cost O(sum of L0),
        independent of table size.  Per-bucket row counts come from the
        written parquet footers (driver-side, no extra job) and keep
        the tiered read's metadata exact.

        Major: rebuild base for buckets whose L1 count hits a
        per-bucket STAGGERED cap (b % 4 jitter spreads majors over fold
        points instead of one global O(table) spike).  Cost O(selected
        buckets)."""
        folded = self._fold_l0(deltas, extras=new_extras)
        for b, entry in folded.items():
            cur = l1_map.setdefault(b, {"files": [], "rows": 0})
            cur["files"] = cur["files"] + entry["files"]
            cur["rows"] = (
                None
                if cur["rows"] is None
                else cur["rows"] + entry["rows"]
            )
        over = [
            b for b, e in l1_map.items()
            if len(e["files"]) >= self.max_deltas + (_bkey_parse(b)[1] % 4)
        ]
        if over:
            # After a split_buckets() the maps hold entries at mixed
            # moduli; a rewrite of residue class X must include every
            # entry whose class INTERSECTS X (classes are
            # hierarchical, so this is the connected component).
            # Pulling in a coarser pre-split base entry rewrites it
            # at the current modulus as a side effect — splits are
            # realized lazily, one touched component at a time.
            comp = set(over)
            pool = set(buckets_map) | {
                k for k, e in l1_map.items() if e["files"]
            }
            grew = True
            while grew:
                grew = False
                for k in pool - comp:
                    if any(_keys_overlap(k, c) for c in comp):
                        comp.add(k)
                        grew = True
            old_base = [k for k in comp if k in buckets_map]
            old_rows = _parquet_rows(
                self._abs([p for b in old_base for p in buckets_map[b]])
            )
            compacted = self._major_compact(
                buckets_map, l1_map, sorted(comp), extras=new_extras
            )
            for b in old_base:
                del buckets_map[b]
            buckets_map.update(compacted)
            for b in comp:
                if b in l1_map:
                    if _bkey_parse(b)[0] == self.n_buckets:
                        l1_map[b] = {"files": [], "rows": 0}
                    else:
                        del l1_map[b]  # stale-modulus key retired
            new_rows = _parquet_rows(
                self._abs([p for ps in compacted.values() for p in ps])
            )
            base_rows = (
                base_rows - old_rows + new_rows
                if base_rows is not None
                else _parquet_rows(
                    self._abs([p for ps in buckets_map.values() for p in ps])
                )
            )
        return buckets_map, l1_map, base_rows

    def fold_pending(self) -> int:
        """Explicit L0 → L1 maintenance fold — exactly the fold a batch
        commit performs when the L0 count reaches ``max_deltas``, as a
        standalone snapshot commit (round 6, guide §2.6 overlap-
        independent-jobs): the incremental runner fires it at the
        half-``max_deltas`` point of a bulk run so the fold's Spark job
        backfills cores idled by the remaining batches' prepare
        stragglers, instead of the whole fold landing serialized at the
        run's last commit (measured: the fold is ~3.5 s of a ~10.8 s
        8-batch replay when paid at the end).  Includes the same
        staggered major-compaction check as the commit-path fold, so
        L1 growth stays bounded no matter which path folds.  Pins ONE
        snapshot (same torn-view rule as compact()); a concurrent
        commit surfaces as SnapshotConflict at publish — callers treat
        the fold as opportunistic and retry or skip.  State-equivalent:
        read() before == read() after (fold only moves rows L0 → L1).
        Returns the number of L0 commits folded (0 = nothing pending)."""
        snap = self._snap  # pin ONE snapshot — see _pending docstring
        deltas = snap["deltas"]
        if not deltas:
            return 0
        new_extras = [tuple(e) for e in snap.get("extra_columns", [])]
        buckets_map = dict(snap["buckets"])
        l1_map = {k: dict(v) for k, v in snap.get("l1", {}).items()}
        buckets_map, l1_map, base_rows = self._fold_and_maybe_major(
            deltas, buckets_map, l1_map, new_extras, snap.get("base_rows"),
        )
        new_snap = dict(
            snap,
            version=snap["version"] + 1,
            buckets=buckets_map,
            l1=l1_map,
            deltas=[],
            base_rows=base_rows,
        )
        self._publish(new_snap)
        return len(deltas)

    def _fold_l0(self, deltas: list, extras: list | None = None) -> dict[str, dict]:
        """L0 → L1: resolve the pending unbucketed commits among
        themselves and write them bucket-pure.  O(L0 volume), ONE
        exchange (see _resolve_bucketed).  Returns bucket → {"files":
        [...], "rows": n} with exact row counts read from the parquet
        footers (driver-side metadata, no Spark job)."""
        paths = [p for e in deltas for p in e["files"]]
        resolved = self._resolve_bucketed(self._raw(self._abs(paths), extras=extras))
        out = self._write_bucketed(resolved, "l1", pre_partitioned=True)
        return {
            b: {"files": ps, "rows": _parquet_rows(self._abs(ps))}
            for b, ps in out.items()
        }

    def _major_compact(
        self, buckets_map: dict, l1_map: dict, buckets: list[str],
        extras: list | None = None,
    ) -> dict[str, list[str]]:
        """Bucket-local major compaction: fold base+L1 of ONLY the given
        bucket entries into fresh bases at the CURRENT modulus.
        O(selected component), never O(table), one exchange.  Caller
        passes a closed set (every entry whose residue class intersects
        the set is in it) and must have folded L0 first (L0 rows are
        unbucketed and could otherwise supersede rows of these buckets)."""
        paths = [p for b in buckets for p in buckets_map.get(b, [])]
        paths += [p for b in buckets for p in l1_map.get(b, {}).get("files", [])]
        resolved = self._resolve_bucketed(self._raw(self._abs(paths), extras=extras))
        return self._write_bucketed(resolved, "base", pre_partitioned=True)

    def _commit_noop(self, job_id, batch_id, seq_from, seq_to, events_read,
                     markers: list | None = None) -> dict:
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
            {k: dict(v) for k, v in self._l1.items()},
            list(self._snap["deltas"]),
            manifest,
            markers=markers,
        )
        return manifest

    def _spill_manifests(self, manifests: list[dict]) -> tuple[list[dict], list[dict]]:
        """Keep the snapshot O(tail): once the inline manifest list
        exceeds 2×MANIFEST_TAIL, write all but the newest MANIFEST_TAIL
        rows to a Parquet sidecar (driver-side pyarrow — rows are tiny
        metadata, no Spark job).  Each spill entry records the sidecar's
        [v_min, v_max] snapshot-version range (VERDICT r4 next-#6), so
        a CDC-out window seek opens only the sidecars that intersect the
        window — O(window), not O(commits), on a long-lived table.
        Returns (retained tail, spill entries)."""
        spill = list(self._snap.get("manifest_spill", []))
        if len(manifests) <= 2 * MANIFEST_TAIL:
            return manifests, spill
        to_spill, tail = manifests[:-MANIFEST_TAIL], manifests[-MANIFEST_TAIL:]
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(os.path.join(self.path, _MANIFEST_DIR), exist_ok=True)
        rel = os.path.join(_MANIFEST_DIR, f"m-{uuid.uuid4().hex}.parquet")
        cols = {
            f.name: [m.get(f.name) for m in to_spill] for f in MANIFEST_SCHEMA.fields
        }
        schema = pa.schema(
            [
                ("job_id", pa.string()),
                ("batch_id", pa.int64()),
                ("seq_from", pa.int64()),
                ("seq_to", pa.int64()),
                ("events_read", pa.int64()),
                ("events_applied", pa.int64()),
                ("deletes_applied", pa.int64()),
                ("min_doc_id", pa.string()),
                ("max_doc_id", pa.string()),
                ("committed_at", pa.string()),
                ("snapshot_version", pa.int64()),
                ("data_hash", pa.int64()),
                ("delta_files", pa.list_(pa.string())),
            ]
        )
        pq.write_table(
            pa.table(cols, schema=schema), os.path.join(self.path, rel)
        )
        vs = [int(m["snapshot_version"]) for m in to_spill]
        return tail, spill + [
            {"path": rel, "v_min": min(vs), "v_max": max(vs)}
        ]

    def _write_filelist_refs(self, new_snap: dict) -> None:
        """Point each bucket's file-list at a sidecar: unchanged buckets
        keep their existing ref; buckets this commit touched go into ONE
        new sidecar JSON.  The commit's driver-side metadata cost is
        therefore O(changed buckets), not O(live files) (VERDICT r2 #1).
        Sidecars are immutable; a crash between sidecar write and
        snapshot link leaves an orphan reclaimed by remove_orphans()."""
        old = self._snap
        old_b, old_l1 = old.get("buckets", {}), old.get("l1", {})
        old_brefs = old.get("buckets_ref") or {}
        old_lrefs = old.get("l1_ref") or {}
        nb, nl = new_snap["buckets"], new_snap["l1"]
        changed_b = {
            b: fs
            for b, fs in nb.items()
            if b not in old_brefs or old_b.get(b) != fs
        }
        changed_l = {
            b: e
            for b, e in nl.items()
            if b not in old_lrefs or old_l1.get(b) != e
        }
        brefs = {
            b: old_brefs[b] for b in nb if b in old_brefs and b not in changed_b
        }
        lrefs = {
            b: old_lrefs[b] for b in nl if b in old_lrefs and b not in changed_l
        }
        if changed_b or changed_l:
            self.fs.makedirs(os.path.join(self.path, _FILELIST_DIR))
            rel = os.path.join(_FILELIST_DIR, f"f-{uuid.uuid4().hex}.json")
            self.fs.write_text(
                os.path.join(self.path, rel),
                json.dumps({"buckets": changed_b, "l1": changed_l}),
            )
            for b in changed_b:
                brefs[b] = rel
            for b in changed_l:
                lrefs[b] = rel
        new_snap["buckets_ref"], new_snap["l1_ref"] = brefs, lrefs

    def _publish(self, new_snap: dict) -> None:
        """Write sidecar refs for changed buckets, then atomically commit
        the snapshot (inline lists stay in memory only)."""
        self._write_filelist_refs(new_snap)
        _commit_snapshot(
            os.path.join(self.path, _SNAP_DIR), new_snap, self.fs
        )
        self._snap = new_snap

    def _commit(
        self,
        buckets_map: dict,
        l1_map: dict,
        deltas: list,
        manifest: dict,
        extra_columns: list | None = None,
        renames: dict | None = None,
        base_rows: int | None = None,
        markers: list | None = None,
    ) -> None:
        job, bid = manifest["job_id"], manifest["batch_id"]
        applied = {k: list(v) for k, v in self._snap["applied"].items()}
        was_applied = _ranges_contains(applied.get(job, []), int(bid))
        applied[job] = _ranges_add(applied.get(job, []), int(bid))
        # forced re-apply: REPLACE the stale manifest row for this
        # (job_id, batch_id) instead of appending a duplicate (ADVICE.md
        # — duplicate rows made verify/merge resolve stale delta files
        # and double-counted lineage metrics)
        manifests = [
            m
            for m in self._snap["manifests"]
            if not (m["job_id"] == job and m["batch_id"] == bid)
        ] + [manifest]
        superseded = dict(self._snap.get("superseded", {}))
        if (
            was_applied
            and len(manifests) > len(self._snap["manifests"])
            and self._snap.get("manifest_spill")
        ):
            # the stale row was NOT in the inline tail, so it sits in an
            # immutable spill sidecar: record the supersession so
            # manifests_df()/changes_between() drop it (ADVICE.md medium).
            # Bounded: grows only on forced re-applies of spilled batches.
            superseded[f"{job}::{bid}"] = manifest["snapshot_version"]
        manifests, spill = self._spill_manifests(manifests)
        new_snap = {
            "version": self.version + 1,
            "n_buckets": self.n_buckets,
            "bucket_expr": self.bucket_expr,
            "max_deltas": self.max_deltas,
            "buckets": buckets_map,
            "base_rows": (
                base_rows if base_rows is not None
                else self._snap.get("base_rows")
            ),
            "l1": l1_map,
            "deltas": deltas,
            "extra_columns": (
                extra_columns
                if extra_columns is not None
                else self._snap.get("extra_columns", [])
            ),
            "renames": (
                renames if renames is not None else self._snap.get("renames", {})
            ),
            "applied": applied,
            "manifests": manifests,
            "manifest_spill": spill,
            "superseded": superseded,
            "markers": (
                markers if markers is not None
                else self._snap.get("markers", [])
            ),
            "watermark": max(self._snap["watermark"], manifest["seq_to"]),
        }
        self._publish(new_snap)

    # ------------------------------------------------------------------
    # schema evolution DDL (Iceberg ALTER TABLE analog)
    # ------------------------------------------------------------------
    def rename_column(self, old: str, new: str) -> None:
        """ALTER TABLE RENAME COLUMN old TO new — metadata-only: the
        logical name changes in the snapshot, existing files keep the
        physical name, reads coalesce(new, old).  Restricted to evolved
        (extra) columns; core TARGET columns are the engine contract."""
        extras = [list(e) for e in self._snap.get("extra_columns", [])]
        names = {e[0] for e in extras}
        if old not in names:
            raise ValueError(f"unknown evolved column {old!r} (have {sorted(names)})")
        if new in names or new in {f.name for f in TARGET_SCHEMA.fields}:
            raise ValueError(f"column {new!r} already exists")
        for e in extras:
            if e[0] == old:
                e[0] = new
        renames = dict(self._snap.get("renames", {}))
        # chain-collapse: if old was itself a rename target, repoint the
        # original physical name at the newest logical name
        for phys, logical in list(renames.items()):
            if logical == old:
                renames[phys] = new
        renames[old] = new
        new_snap = dict(
            self._snap,
            version=self.version + 1,
            extra_columns=extras,
            renames=renames,
        )
        self._publish(new_snap)

    # ------------------------------------------------------------------
    # bucket lifecycle (VERDICT r2 #2: fixed n_buckets made 1.6 TB
    # buckets inevitable at 100 TB; splitting keeps compaction spikes
    # and touched-bucket resolves bounded as the table grows)
    # ------------------------------------------------------------------
    def split_buckets(self, factor: int = 2) -> None:
        """Raise the bucket modulus — METADATA-ONLY (Iceberg
        partition-spec-evolution analog).  Existing entries keep their
        write-time modulus and stay readable/prunable (an old entry
        (m, r) is exactly the union of current residues {r, r+m, …});
        new folds and majors write at the new modulus, so the split is
        realized lazily, component by component, with zero immediate
        I/O.  ``factor`` must be a power of two so every historical
        modulus divides the current one."""
        if factor < 2 or (factor & (factor - 1)):
            raise ValueError("factor must be a power of two >= 2")
        snap = self._snap  # pin ONE snapshot — see _pending docstring
        new_snap = dict(
            snap,
            version=snap["version"] + 1,
            n_buckets=snap["n_buckets"] * factor,
        )
        self._publish(new_snap)

    def split_bucket(self, key: str) -> list[str]:
        """Eagerly rewrite ONE pre-split base entry into its children at
        the current modulus (``key`` is a modulus-qualified snapshot
        bucket key, e.g. ``"64:3"``).  Cost O(that bucket); no resolve
        needed — base entries are one-row-per-key, the rewrite only
        re-partitions them.  Pending L1/L0 rows over the same keys are
        untouched: read-time resolve handles them regardless of the
        base's modulus.  Returns the new entry keys."""
        snap = self._snap  # pin ONE snapshot — see _pending docstring
        bm = dict(snap["buckets"])
        files = bm.get(key)
        if not files:
            raise ValueError(f"unknown or empty bucket entry {key!r}")
        m, _r = _bkey_parse(key)
        if m == snap["n_buckets"]:
            raise ValueError(
                f"bucket {key!r} is already at the current modulus "
                f"{snap['n_buckets']}; call split_buckets() first"
            )
        out = self._write_bucketed(self._raw(self._abs(files)), "base")
        del bm[key]
        bm.update(out)
        new_snap = dict(snap, version=snap["version"] + 1, buckets=bm)
        self._publish(new_snap)
        return sorted(out)

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------
    def compact(self) -> None:
        """Full maintenance compaction: fold L0+L1+base into fresh
        bucket-pure bases (the explicit, all-at-once form of what the
        ingest path does incrementally).  Pins ONE snapshot for the
        whole operation (same torn-view rule as read()/scan_raw()): a
        concurrent commit between the pending-file listing and the
        final snapshot build must surface as a version conflict at
        _publish, never as a base built from a MIX of two snapshots."""
        snap = self._snap  # pin ONE snapshot — see _pending docstring
        pend_files, _ = self._pending(snap=snap)
        if not pend_files:
            return
        paths = [p for ps in snap["buckets"].values() for p in ps]
        paths += pend_files
        resolved = self._resolve(self._raw(self._abs(paths)))
        buckets_map = self._write_bucketed(resolved, "base")
        new_snap = dict(
            snap,
            version=snap["version"] + 1,
            buckets=buckets_map,
            base_rows=_parquet_rows(
                self._abs([p for ps in buckets_map.values() for p in ps])
            ),
            l1={},
            deltas=[],
        )
        self._publish(new_snap)

    def purge_tombstones(self, horizon_seq: int) -> int:
        """Physically drop tombstones with ``_commit_seq <= horizon_seq``.

        Contract (same shape as Iceberg/Delta vacuum horizons): after
        purging at H, forced replays of ranges ending at or below H are
        no longer resurrection-safe.  Normal watermark-resumed ingest is
        unaffected.  Returns the number of tombstones purged.  One pass:
        the purge count rides the rewrite job via Observation instead of
        a separate count() job.
        """
        from pyspark.sql import Observation

        snap = self._snap  # pin ONE snapshot — see _pending docstring
        all_rows = self.read(include_deleted=True)
        purge = F.col("_deleted") & (F.col("_commit_seq") <= horizon_seq)
        obs = Observation(f"purge-{uuid.uuid4().hex[:8]}")
        kept = all_rows.observe(
            obs, F.sum(purge.cast("long")).alias("n_purged")
        ).where(~purge)
        buckets_map = self._write_bucketed(kept, "base")
        n_purged = int(obs.get["n_purged"] or 0)
        if n_purged == 0:
            # nothing purged: drop the just-written redundant base copy
            import shutil

            dirs = {
                os.path.dirname(os.path.dirname(self._abs([p])[0]))
                for ps in buckets_map.values()
                for p in ps
            }
            for d in dirs:
                shutil.rmtree(d, ignore_errors=True)
            return 0
        # Build from the PINNED snap: a concurrent commit between the
        # read and here surfaces as a SnapshotConflict at _publish
        # (version CAS), never as a snapshot that silently drops the
        # deltas the read didn't fold in.
        new_snap = dict(
            snap,
            version=snap["version"] + 1,
            buckets=buckets_map,
            base_rows=_parquet_rows(
                self._abs([p for ps in buckets_map.values() for p in ps])
            ),
            l1={},
            deltas=[],
        )
        self._publish(new_snap)
        return n_purged

    def _snapshot_file_refs(self, version: int, tolerant: bool = False):
        """(data file rels, auxiliary rels) referenced by one retained
        snapshot: base + L1 + L0 data files, manifest-row delta files,
        manifest spill sidecars and file-list sidecars.  Metadata-only —
        reads the snapshot JSON and its sidecar JSONs, never lists the
        data directory.  ``tolerant`` skips sidecars that are already
        gone (expired snapshots being torn down)."""
        snap_file = os.path.join(self.path, _SNAP_DIR, _snap_name(version))
        s = _normalize_snap(json.loads(self.fs.read_text(snap_file)))
        aux = {e["path"] for e in s.get("manifest_spill", [])}
        aux |= set((s.get("buckets_ref") or {}).values())
        aux |= set((s.get("l1_ref") or {}).values())
        try:
            _resolve_filelists(self.path, s, self.fs)
        except FileNotFoundError:
            if not tolerant:
                raise
            s.setdefault("buckets", {})
            s.setdefault("l1", {})
        data = set()
        for ps in s.get("buckets", {}).values():
            data.update(ps)
        for e in s.get("l1", {}).values():
            data.update(e["files"])
        for e in s.get("deltas", []):
            data.update(e["files"])
        for e in s.get("markers", []):
            data.update(e["files"])
        # NOTE: manifest rows' delta_files are deliberately NOT refs —
        # once compaction supersedes a commit's delta AND every snapshot
        # still holding it in buckets/l1/deltas expires, the CDC-out
        # window over it closes (changes_between detects the missing
        # file and raises its documented "window closed" error).
        return data, aux

    def expire_snapshots(self, retain_last: int = 1) -> dict:
        """Expire old snapshots AND delete the files only they reference
        — the Iceberg ``expireSnapshots`` analog, and the scale path for
        reclaiming superseded compaction outputs: candidates come from
        DIFFING snapshot metadata, so nothing ever lists the data
        directory (object-store-safe; VERDICT r2 #4).  Coupling file
        removal with snapshot expiry also means ``load(version=...)`` of
        a reclaimed version fails fast with "snapshot not found" instead
        of a mid-scan parquet FileNotFound (ADVICE.md).  The current
        snapshot is always retained.  Returns removal counts."""
        snap_dir = os.path.join(self.path, _SNAP_DIR)
        versions = sorted(
            int(f[1:-5])
            for f in self.fs.listdir(snap_dir)
            if f.startswith("v") and f.endswith(".json")
        )
        retain_last = max(1, retain_last)
        retained = set(versions[-retain_last:]) | {self.version}
        expired = [v for v in versions if v not in retained]
        if not expired:
            return {"snapshots_expired": 0, "files_removed": 0}
        live: set[str] = set()
        for v in sorted(retained):
            data, aux = self._snapshot_file_refs(v)
            live |= data | aux
        dead: set[str] = set()
        for v in expired:
            data, aux = self._snapshot_file_refs(v, tolerant=True)
            dead |= data | aux
        removed = 0
        for rel in sorted(dead - live):
            p = os.path.join(self.path, rel)
            try:
                self.fs.delete(p)
                removed += 1
            except FileNotFoundError:
                pass
        for v in expired:
            self.fs.delete(os.path.join(snap_dir, _snap_name(v)))
        return {"snapshots_expired": len(expired), "files_removed": removed}

    def vacuum(self, grace_secs: float = 3600.0) -> int:
        """Remove ORPHAN files: ones referenced by NO retained snapshot
        (crashed ``prepare_delta`` leftovers, losers of snapshot-conflict
        races).  This is the Iceberg ``remove_orphan_files`` analog — the
        one maintenance op that must list the store, because a true
        orphan appears in no metadata at all; run it rarely.  Superseded
        compaction outputs are NOT orphans (older retained snapshots
        still reference them — so vacuum alone never invalidates time
        travel or an open ``changes_between`` window, ADVICE.md); they
        are reclaimed by ``expire_snapshots``, which never lists the
        data directory.

        ``grace_secs`` (Iceberg-style retention): files YOUNGER than the
        window are kept even if unreferenced — a delta written by an
        in-flight ``prepare_delta`` is unreferenced until its
        ``commit_delta`` lands, so vacuuming without a grace window
        under a live writer would delete files the next snapshot is
        about to reference (ADVICE.md).  Pass 0 only when no writer can
        be active."""
        snap_dir = os.path.join(self.path, _SNAP_DIR)
        live: set[str] = set()
        for fn in self.fs.listdir(snap_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                data, aux = self._snapshot_file_refs(int(fn[1:-5]))
                live |= data | aux
        live = {os.path.join(self.path, rel) for rel in live}
        now = time.time()
        removed = 0
        for root in (_DATA_DIR, _MANIFEST_DIR, _FILELIST_DIR):
            top = os.path.join(self.path, root)
            if not os.path.isdir(top):
                continue
            for dirpath, _dirs, fnames in os.walk(top, topdown=False):
                for fn in fnames:
                    p = os.path.join(dirpath, fn)
                    if not p.endswith((".parquet", ".json")) or p in live:
                        continue
                    try:
                        age = now - os.path.getmtime(p)
                    except OSError:
                        continue
                    if age >= grace_secs:
                        os.unlink(p)
                        removed += 1
                if not os.listdir(dirpath) and dirpath != top:
                    os.rmdir(dirpath)
        return removed

    def _live_files(self) -> list[str]:
        out = [p for ps in self._snap["buckets"].values() for p in ps]
        for e in self._l1.values():
            out.extend(e["files"])
        for e in self._snap["deltas"]:
            out.extend(e["files"])
        for e in self._snap.get("markers", []):
            out.extend(e["files"])
        return out


class SnapshotConflict(RuntimeError):
    """Another writer published this snapshot version first."""


# ---------------------------------------------------------------------------
# snapshot file helpers
# ---------------------------------------------------------------------------
def _parquet_rows(paths: list[str]) -> int:
    """Exact row count from parquet footers — driver-side metadata read,
    no Spark job (the footer is O(KB) regardless of file size)."""
    import pyarrow.parquet as pq

    return sum(pq.ParquetFile(p).metadata.num_rows for p in paths)


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


def _latest_version(snap_dir: str, fs: MetaFS | None = None) -> int | None:
    fs = fs or LocalMetaFS()
    versions = [
        int(f[1:-5]) for f in fs.listdir(snap_dir)
        if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def _commit_snapshot(
    snap_dir: str, snap: dict, fs: MetaFS | None = None
) -> None:
    """Atomic, conflict-detecting publish via the control-plane FS's
    put-if-absent (LocalMetaFS: write temp + hard-link — link(2) fails
    with EEXIST if another writer won the version; remote impls map to
    their store's conditional put)."""
    fs = fs or LocalMetaFS()
    final = os.path.join(snap_dir, _snap_name(snap["version"]))
    to_write = snap
    if snap.get("buckets_ref") is not None or snap.get("l1_ref") is not None:
        # ref-based layout: the inline buckets/l1 maps are in-memory
        # working state only — the durable form is the sidecar refs
        to_write = {k: v for k, v in snap.items() if k not in ("buckets", "l1")}
    try:
        fs.create_exclusive(final, json.dumps(to_write))
    except FileExistsError as e:
        raise SnapshotConflict(
            f"snapshot conflict: {final} already committed by a concurrent writer"
        ) from e
