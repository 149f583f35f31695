"""The incremental runner — the Spark analog of the reference's loader
lifecycle (loader/service.go:18-105, SURVEY §3.1):

  watermark resolution → batch plan by commit_seq range → per batch:
  range scan → normalize → salted repartition → LWW dedup → MERGE →
  manifest commit.

The reference's pipeline machinery (collector goroutine, bounded
channels, worker pools, memory governor — loader/service.go:82-97,
utils/tools.go:16-49) does not exist here: each batch is ONE Spark
logical plan; Catalyst/AQE choose the physical strategy, and the driver
loop owns only batch sequencing, exactly like `dlt load`'s outer loop.

Batch ids are ``lo // batch_width`` — a pure function of log position,
so a replayed/resumed run produces the same (job_id, batch_id) keys and
the manifest replay-guard holds across process restarts.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from dlt_spark.adapters import MASS_DELETE, get_adapter
from dlt_spark.lakehouse import LakehouseTable
from dlt_spark.operators.dedup import dedup_lww
from dlt_spark.operators.salt import salted_repartition
from dlt_spark.sources.changelog import open_change_log, slice_change_log


# Shared-candidate-snapshot bounds: one materialized key-projected
# table scan amortizes across at most this many batches; longer runs
# fall back to per-batch pruned scans (the gap windows, which the
# shared mode widens to (run-start, batch-start), stay O(this) deltas
# deep).  The row floor makes engagement SCALE-CONDITIONAL — measured
# crossover (pre-loaded table, 8 delete-bearing catch-up batches,
# interleaved ×3, BENCH/BASELINE.md r5 addendum):
#   ~0.6M table rows: shared 1.05× per-batch (the upfront eager
#     localCheckpoint + wider phase-B gaps outweigh the tiny scans)
#   ~1.2M table rows: shared 0.945× per-batch (the amortized scan
#     starts paying)
# so the floor sits at the crossover; above it the N repeated
# key-projection scans dominate and the gap to per-batch widens with
# table size.  Both shapes are locked state-equivalent by test, so the
# switch is purely a cost choice.
_SHARED_CAND_MAX_BATCHES = 16
_SHARED_CAND_MIN_ROWS = 1_000_000


@dataclass
class RunResult:
    job_id: str
    batches_planned: int
    batches_applied: int
    batches_skipped: int  # already in manifest (replay no-ops)
    events_read: int
    events_applied: int
    deletes_applied: int
    wall_secs: float
    manifests: list[dict] = field(default_factory=list)

    @property
    def events_per_sec(self) -> float:
        return self.events_read / self.wall_secs if self.wall_secs > 0 else 0.0


def plan_batches(seq_from: int, seq_to: int, batch_width: int) -> list[tuple[int, int, int]]:
    """[(batch_id, lo, hi_inclusive)] — aligned to batch_width boundaries
    so equal commit_seq values always land in the same batch (ties must
    be resolved by one LWW pass, SURVEY §7 hard-part #2) and replays
    regenerate identical batch ids."""
    out = []
    lo = (seq_from // batch_width) * batch_width
    while lo <= seq_to:
        hi = lo + batch_width - 1
        out.append((lo // batch_width, max(lo, seq_from), min(hi, seq_to)))
        lo = hi + 1
    return out


def run_incremental(
    spark: SparkSession,
    log_path: str,
    table_path: str,
    job_id: str = "dlt",
    seq_from: int | None = None,
    seq_to: int | None = None,
    batch_width: int = 1_000_000,
    n_buckets: int = 64,
    force: bool = False,
    use_arrow_udf: bool = False,
    schema: str = "tokens",
    salt: bool = False,
    salt_partitions: int | None = None,
    # pipelining depth swept at the sf0.1 bench point (3.15M events, 8
    # batches, local[32]; within-session, interleaved, median of 3 with
    # tmpfs kept flat): 3→131k, 4→166k, 5→138k, 6→109k ev/s.  Across
    # fresh sessions 3-vs-4 is inside environment noise (±15%); 5+ is
    # reliably worse (queued preparations contend with the in-flight
    # batch's own stages).
    max_inflight: int = 4,
    log_part_width: int = 100_000,
    fail_after_batches: int | None = None,
    stop_requested=None,
    verbose: bool = False,
    # "eager" (default): cascade deletes tombstone every child at ingest
    # — the CDC-out feed carries them.  "markers" (OPT-IN): record
    # equality-delete markers instead; the candidate join moves to read
    # time (and to materialize_markers), delete batches ingest at plain
    # speed, but changes_between no longer carries cascade-deleted
    # children — only for consumers without CDC-out.
    cascade_mode: str = "eager",
    # Early-fold threshold for bulk runs (None → max_deltas // 2): once
    # a fold is inevitable this run, fold when L0 reaches this count so
    # the fold overlaps the remaining prepares; see the commit loop.
    early_fold_at: int | None = None,
) -> RunResult:
    """One catch-up run (the `dlt load` analog, SURVEY §3.1/§3.3).

    - ``seq_from``/``seq_to`` bound the replay (``--from/--to-bundle-id``);
      unset ``seq_from`` resumes from the manifest watermark + 1 (P2).
    - ``force=True`` re-applies a range even below the watermark — safe
      here (idempotent MERGE + manifest guard), unlike the reference
      where --force duplicates rows (loader/service.go:30-36).
    - ``fail_after_batches`` injects a crash between batch commits for
      the resume test (SURVEY §5).
    - ``schema`` selects the SchemaAdapter (the reference's config-string
      schema switch, loader/setup.go:68-78); an adapter object is also
      accepted.
    - ``stop_requested`` (callable → bool): graceful-shutdown probe
      checked at each batch boundary — the reference's SIGINT handling
      finishes the in-flight work then exits (cmd/dlt/commands/
      load.go:62-86); here a stop leaves the table at a committed batch
      boundary and the next run resumes from the watermark.
    """
    if cascade_mode not in ("eager", "markers"):
        raise ValueError(
            f"cascade_mode must be 'eager' or 'markers', got {cascade_mode!r}"
        )
    adapter = get_adapter(schema)
    table = LakehouseTable.create(
        spark, table_path, n_buckets=n_buckets,
        bucket_expr=getattr(adapter, "bucket_expr", "doc_id"),
    )
    if seq_from is None:
        seq_from = table.watermark() + 1 if not force else 0
    if seq_to is None:
        # End of log unknown: full-dataset open, then one max() job.
        # UNFILTERED on purpose (round 6): max(commit_seq) over rows
        # >= seq_from equals the global max whenever that max clears
        # seq_from, and is the empty case otherwise — and the
        # filter-free aggregate qualifies for parquet aggregate
        # pushdown (session conf), so the job reads FOOTER STATS
        # instead of the commit_seq column of the whole log.
        from pyspark.sql import functions as F

        log_df = open_change_log(spark, log_path)
        row = log_df.agg(F.max("commit_seq").alias("m")).collect()[0]
        if row["m"] is None or (not force and int(row["m"]) < seq_from):
            return RunResult(job_id, 0, 0, 0, 0, 0, 0, 0.0)
        seq_to = int(row["m"])
    else:
        # Bounds known (steady ticks / explicit replays): open only the
        # seq_part dirs the run can touch — O(window) discovery.  The
        # cascade gap windows reach down to (watermark, batch-start), so
        # the lower bound is min(seq_from, watermark + 1), never bare
        # seq_from (a forced/overlap replay may start above the gap).
        lo_bound = min(seq_from, table.watermark() + 1)
        log_df = open_change_log(
            spark, log_path, seq_from=max(0, lo_bound), seq_to=seq_to,
            part_width=log_part_width,
        )
    if seq_from > seq_to:
        return RunResult(job_id, 0, 0, 0, 0, 0, 0, 0.0)

    batches = plan_batches(seq_from, seq_to, batch_width)
    # Scale-adaptive shuffle parallelism (guide §2.2/§2.4 + round-6
    # measurement): derive the reduce-partition count from the batch
    # input size instead of running every batch at the configured
    # ceiling.  A 50 MB steady-tick batch at 128 partitions pays ~0.15 s
    # of AQE coalescing + task-wave latency per query; sized to ~16 MB
    # per partition (~1.2 KB/event), snapped to a power-of-two multiple
    # of defaultParallelism//4 so reduce waves divide the cores evenly
    # (measured: 48 partitions on 32 cores is SLOWER than both 32 and
    # 128 — a 1.5-wave straggler tail), it runs at 8 (ticks) / 32 (the
    # 394k-event driver batches).  The CONFIGURED value stays the
    # ceiling, so cluster operators keep control at scale (a TB-scale
    # batch estimate simply saturates the ceiling and nothing changes);
    # AQE stays on for skew/coalesce inside whatever count is chosen.
    # Restored in the finally below — the derivation is per run, not a
    # session mutation.
    _shuf_prev = int(spark.conf.get("spark.sql.shuffle.partitions"))
    _est = max(1, min(batch_width, seq_to - seq_from + 1)) // 16_000 + 1
    _p = max(1, spark.sparkContext.defaultParallelism // 4)
    while _p < _est and _p < _shuf_prev:
        _p *= 2
    _p = min(_p, _shuf_prev)
    spark.conf.set("spark.sql.shuffle.partitions", str(_p))
    try:
        t0 = time.monotonic()
        applied = skipped = ev_read = ev_applied = dels = 0
        manifests: list[dict] = []

        def _prepare(batch_id: int, lo: int, hi: int, _attempts: int = 2) -> dict:
            """Bounded retry (SURVEY §2.7 X5 — replaces the reference's
            unbounded 1s·2^k loop, utils/tools.go:66-75): Spark already
            retries tasks; this covers whole-job failures.  The job is
            idempotent (fresh delta dir per attempt; orphans vacuum away),
            so a retry is safe by construction."""
            last: Exception | None = None
            for attempt in range(_attempts):
                try:
                    return _prepare_once(batch_id, lo, hi)
                except Exception as e:  # noqa: BLE001 — rethrown after retries
                    last = e
                    if attempt + 1 < _attempts:
                        time.sleep(1.0 * (attempt + 1))
            raise last  # type: ignore[misc]

        def _prepare_once(batch_id: int, lo: int, hi: int) -> dict:
            events = slice_change_log(log_df, lo, hi, log_part_width)
            normalized = adapter.normalize(events, use_arrow_udf=use_arrow_udf)
            cascade_ctx = None
            markers_delta = None
            if batch_id in del_batches and cascade_mode == "markers":
                # Equality-delete markers (opt-in): ONE tiny parquet write
                # of (parent, del_seq, source) rides the batch's atomic
                # commit; no candidate scan, no tombstone rows, no phase B.
                from pyspark.sql import functions as F

                dr = del_batches[batch_id]
                if dr is MASS_DELETE:
                    dels = (
                        slice_change_log(log_df, lo, hi, log_part_width)
                        .where(F.col("op") == "D")
                        .select(
                            F.col("doc_id").alias("p"),
                            F.col("commit_seq").alias("del_seq"),
                            F.col("source").alias("del_source"),
                        )
                        .distinct()
                    )
                else:
                    # collected sparse path: hand the rows straight to the
                    # driver-side pyarrow writer — zero Spark jobs
                    dels = [(r["p"], r["del_seq"], r["del_source"]) for r in dr]
                markers_delta = table.prepare_markers(dels)
            elif batch_id in del_batches:
                # TWO-PHASE cascade (VERDICT r3 next-#2).  Phase A (here):
                # expand_deletes unions tombstones for the table snapshot +
                # this batch's own children into the batch — riding the
                # already-running dedup+write job.  Phase B (gap pool):
                # tombstones for the (watermark, batch-start) gap, built
                # from the in-flight batches' prepared delta FILES and
                # merged into this batch's atomic commit — the gap is never
                # re-normalized.  Capture the committed watermark FIRST (a
                # commit landing between this read and the snapshot-backed
                # scan inside expand_deletes only widens the overlap, never
                # opens a gap — blanket tombstones are LWW-idempotent,
                # double-cover is free).  A/B'd alternatives (4-round
                # interleaved medians, sf0.1 all-delete bulk shape): r3's
                # gap-re-normalize-per-prepare 15.5s; this form 14.0s;
                # fully-detached side job for ALL tombstones 17.2s (a third
                # standalone job per batch loses to riding the main write);
                # unioning phase-A tombstones AFTER dedup_lww in the same
                # write job 15.0s (skipping the shuffle writes candidate
                # multiplicity raw — the dedup collapse pays for itself).
                # Shared-snapshot mode pins EVERY delete batch's candidate
                # watermark at the run start; the wider (wm, lo) gap is
                # served by the earlier batches' prepared delta files.
                wm0 = shared_wm if shared_wm is not None else table.watermark()
                normalized = adapter.expand_deletes(
                    normalized, table, del_rows=del_batches[batch_id],
                    # concurrent-prepare shape iff the gap is non-empty —
                    # the materialization A/B in expand_deletes
                    materialize=wm0 + 1 <= lo - 1,
                    table_candidates=shared_cand if shared_wm is not None
                    else None,
                )
                cascade_ctx = (wm0,)
            # Salting is OFF by default: the LWW dedup is a hash aggregate
            # with map-side partial aggregation, which already collapses a
            # hot key inside each map task before the shuffle — the classic
            # "hot key floods one reducer" failure mode does not apply.
            # salt=True adds an explicit spreading shuffle for stages that
            # DO need balanced key-local work (e.g. order-dependent grouped
            # UDFs); it costs one extra shuffle per batch (SURVEY §2.7 X4).
            spread = (
                salted_repartition(normalized, num_partitions=salt_partitions)
                if salt
                else normalized
            )
            updates = dedup_lww(spread, with_counts=True)
            prepared = table.prepare_delta(updates, job_id, batch_id)
            if cascade_ctx is not None:
                prepared["_cascade_ctx"] = cascade_ctx
            if markers_delta is not None:
                prepared["markers_delta"] = markers_delta
            return prepared

        def _gap_task(batch_id: int, lo: int, hi: int):
            """Cascade side-job wrapper running in the SEPARATE gap pool:
            waits on the batch's own phase-A future (for the captured
            watermark + materialized batch), then builds the tombstone
            delta.  Gap-pool tasks wait only on MAIN-pool futures, and
            main-pool tasks never wait on anything — so the wait graph is
            bipartite and acyclic (no deadlock at any pool size), and the
            side jobs of different delete batches run concurrently instead
            of chaining through prepare futures."""
            ctx = futs[batch_id].result().get("_cascade_ctx")
            if ctx is None:
                return None
            return _gap_tombstones(batch_id, lo, hi, ctx[0])

        def _gap_tombstones(batch_id: int, lo: int, hi: int, wm: int):
            """Phase B of the two-phase cascade delete: a slim tombstone
            delta for children in the (wm, lo) gap — the batches that were
            still in flight when phase A captured its table snapshot
            (phase A's expand_deletes covers the table + the batch's own
            children inside the main prepare).  Waits for the gap batches'
            phase-A futures (their PREPARES, not commits): the finished
            prepares' delta FILES are the candidate source — already
            normalized, exploded and LWW-deduped — so phase B is a
            projected parquet scan of ≲ max_inflight batches + one join
            against the delete parents + one small delta write, never a
            re-normalize.  (The r3 design re-normalized the gap inside
            each pipelined prepare; with deletes in every batch that cost
            >2.4× plain ingest.)  Reading a prepared-but-uncommitted delta
            is safe because this batch COMMITS only after those batches do
            (ordered commits), so its tombstones never outlive their
            sources.  The log-slice fallback below covers only a range not
            prepared by this run (force/overlap replays) or whose prepare
            failed.  Returns a prepared-delta dict that commit merges into
            the batch's atomic commit unit, or None when the gap is empty.
            Tombstones skip LWW entirely (shuffle-free): duplicates settle
            at read-resolve by (_commit_seq, D-rank, _row_id)."""
            if wm + 1 > lo - 1:
                return None
            from pyspark.sql import functions as F

            reused: list[str] = []
            pend_ranges: list[tuple[int, int]] = []
            for b in range((wm + 1) // batch_width, batch_id):
                b_lo = max(wm + 1, b * batch_width)
                b_hi = min(lo - 1, (b + 1) * batch_width - 1)
                if b_hi < b_lo:
                    continue
                f = futs.get(b)
                prep = None
                if f is not None:
                    try:
                        prep = f.result()  # blocks on phase A only
                    except Exception:  # noqa: BLE001 — its own path raised
                        prep = None
                if prep is not None:
                    reused.extend(table._abs(prep["files"]))
                else:
                    if pend_ranges and pend_ranges[-1][1] + 1 == b_lo:
                        pend_ranges[-1] = (pend_ranges[-1][0], b_hi)
                    else:
                        pend_ranges.append((b_lo, b_hi))
            parts = []
            if reused:
                d = spark.read.parquet(*reused)
                parts.append(
                    d.where(~F.col("_deleted")).select(
                        "doc_id", "kind", "array_index", "parent_doc_id",
                        F.col("_commit_seq").alias("child_seq"),
                    )
                )
            for g_lo, g_hi in pend_ranges:
                parts.append(
                    adapter.normalize(
                        slice_change_log(log_df, g_lo, g_hi, log_part_width),
                        use_arrow_udf=use_arrow_udf,
                    )
                    .where(F.col("op") != "D")
                    .select(
                        "doc_id", "kind", "array_index", "parent_doc_id",
                        F.col("commit_seq").alias("child_seq"),
                    )
                )
            if not parts:
                return None
            cand = parts[0]
            for p in parts[1:]:
                cand = cand.unionByName(p)
            # delete parents of THIS batch, straight from the raw log slice
            # (parent deletes are parent-level rows — no normalize needed);
            # broadcast only on the sparse (collected) path, a mass delete
            # stays a shuffle join
            dels = (
                slice_change_log(log_df, lo, hi, log_part_width)
                .where(F.col("op") == "D")
                .select(
                    F.col("doc_id").alias("p"),
                    F.col("commit_seq").alias("del_seq"),
                    F.col("source").alias("del_source"),
                )
                .distinct()
            )
            if del_batches.get(batch_id) is not MASS_DELETE:
                dels = F.broadcast(dels)
            tombs = (
                cand.join(dels, cand["parent_doc_id"] == dels["p"])
                .where(F.col("child_seq") < F.col("del_seq"))
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
                    # counts column so the merged commit keeps exact
                    # events_read semantics without an LWW pass here
                    F.lit(1).cast("long").alias("_n_events"),
                )
            )
            # coalesce keeps the slim delta at a few files instead of one
            # per gap-scan partition
            return table.prepare_delta(tombs.coalesce(4), job_id, batch_id)

        # Pipelined execution (the Spark analog of the reference's staged
        # collector→workers→sink pipeline, loader/service.go:82-97): delta
        # PREPARATION for up to ``max_inflight`` batches runs concurrently —
        # MoR delta writes are independent — while snapshot COMMITS stay
        # strictly in batch order (exactly-once and watermark monotonicity
        # live in the commit).  This hides per-batch driver latency behind
        # the next batches' distributed compute.
        work = [
            (batch_id, lo, hi)
            for batch_id, lo, hi in batches
            if force or not table.is_applied(job_id, batch_id)
        ]
        skipped = len(batches) - len(work)

        # Cascade deletes (VERDICT r2 #3): ONE pushed-predicate scan of the
        # planned range finds the delete batches AND prefetches each
        # delete's (parent, seq, source) plus the parent's bucket residue —
        # a delete-batch's prepare then runs zero extra driver jobs (no
        # per-batch collect, no residue job); the candidate lookup is
        # handed its pruning set.  Driver memory is CAPPED (VERDICT r3
        # wrong-#1): a per-batch count runs first, and any batch above
        # ``mass_delete_parents`` distinct delete rows is marked
        # MASS_DELETE instead of collected — its parent set then stays a
        # DataFrame end to end (adapter + phase-B join), so a GDPR-style
        # purge of millions of parents never materializes driver-side.
        # Delete batches don't barrier: blanket tombstones are
        # LWW-idempotent, so the lookup reads stale table state and the
        # gap is settled by phase B at commit (see _gap_tombstones).
        del_batches: dict[int, object] = {}
        mass_delete_parents = getattr(adapter, "MAX_PRUNED_PARENTS", 65_536)
        if getattr(adapter, "cascade_deletes", False) and work:
            from pyspark.sql import functions as F

            rng = slice_change_log(
                log_df, min(w[1] for w in work), max(w[2] for w in work),
                log_part_width,
            )
            d = (
                rng.where(F.col("op") == "D")
                .select(
                    F.floor(F.col("commit_seq") / batch_width)
                    .cast("long")
                    .alias("bid"),
                    F.col("doc_id").alias("p"),
                    F.col("commit_seq").alias("del_seq"),
                    F.col("source").alias("del_source"),
                    F.pmod(F.xxhash64("doc_id"), F.lit(table.n_buckets))
                    .cast("int")
                    .alias("b"),
                )
                .distinct()
            )
            if len(work) == 1:
                # single-batch run (the steady-tick shape): skip the
                # per-batch count job — one cap-guarded collect decides
                # small-vs-mass directly, halving the prefetch's driver
                # jobs on the latency-sensitive path
                rows = d.limit(mass_delete_parents + 1).collect()
                if len(rows) > mass_delete_parents:
                    del_batches[work[0][0]] = MASS_DELETE
                else:
                    for r in rows:
                        del_batches.setdefault(int(r["bid"]), []).append(r)
            else:
                counts = {
                    int(r["bid"]): r["c"]
                    for r in d.groupBy("bid").agg(F.count("*").alias("c")).collect()
                }
                small = [b for b, c in counts.items() if c <= mass_delete_parents]
                for b, c in counts.items():
                    if c > mass_delete_parents:
                        del_batches[b] = MASS_DELETE
                if small:
                    for r in d.where(F.col("bid").isin(small)).collect():
                        del_batches.setdefault(int(r["bid"]), []).append(r)

        # Run-scoped SHARED candidate snapshot (VERDICT r4 next-#1): with
        # deletes in SEVERAL batches of one run, each phase A used to pay
        # its own key-projected table scan — the dominant residual in the
        # bulk-cascade decomposition (BENCH/BASELINE.md r4).  Here ONE
        # unpruned key-projected scan_raw is materialized (localCheckpoint,
        # one upfront job) at the run's starting watermark and reused by
        # every delete batch; rows committed after that watermark reach
        # each batch through its phase-B gap candidates, whose machinery
        # (_gap_tombstones over the earlier batches' PREPARED delta files)
        # already covers exactly the (run-start, batch-start) window.
        # Bounded to runs of <= _SHARED_CAND_MAX_BATCHES batches — beyond
        # that the widening gap windows outgrow the saved scans — and to
        # >= 2 delete batches (a single delete batch's bucket-pruned scan
        # is cheaper than an unpruned materialization).
        shared_wm: int | None = None
        shared_cand = None
        # pin ONE snapshot for both numbers (VERDICT r5 next-#2): the
        # gate is a cost heuristic, but reading base_rows and pending
        # from different snapshots is the torn-view pattern the pinning
        # work eliminated everywhere else — keep the invariant uniform.
        _snap = table._snap
        _pend = table._pending(snap=_snap)[1]
        _table_rows = (_snap.get("base_rows") or 0) + (_pend or 0)
        if (
            cascade_mode != "markers"
            and len(del_batches) >= 2
            and len(work) <= _SHARED_CAND_MAX_BATCHES
            and _table_rows >= _SHARED_CAND_MIN_ROWS
        ):
            from pyspark.sql import functions as F

            shared_wm = table.watermark()
            tdf = table.scan_raw(
                columns=["doc_id", "kind", "array_index", "parent_doc_id"]
            )
            if "kind" in tdf.columns:  # empty fresh table has no extras yet
                shared_cand = (
                    tdf.select("doc_id", "kind", "array_index", "parent_doc_id")
                    .withColumn("child_seq", F.lit(-1).cast("long"))
                    .localCheckpoint(eager=True)
                )
            else:
                shared_cand = False  # sentinel: table empty — skip the scan

        from concurrent.futures import ThreadPoolExecutor

        def _commit_one(batch_id: int, lo: int, hi: int, prepared: dict) -> None:
            nonlocal applied, ev_read, ev_applied, dels
            # "_cascade_ctx" must stay in `prepared` until the gap task has
            # read it (it waits on this batch's phase-A future concurrently)
            # — but it is runner-internal, so strip it from the copy handed
            # to commit_delta rather than relying on unknown-key tolerance.
            gf = gap_futs.get(batch_id)
            if gf is not None:
                supp = gf.result()
                if supp is not None:
                    prepared = LakehouseTable.merge_prepared(prepared, supp)
            if "_cascade_ctx" in prepared:
                prepared = {k: v for k, v in prepared.items()
                            if k != "_cascade_ctx"}
            m = table.commit_delta(
                prepared, job_id, batch_id, seq_from=lo, seq_to=hi, force=force
            )
            manifests.append(m)
            applied += 1
            ev_read += m["events_read"]
            ev_applied += m["events_applied"]
            dels += m["deletes_applied"]
            if verbose:
                print(
                    f"[{job_id}] batch {batch_id} seq[{lo},{hi}] "
                    f"read={m['events_read']} applied={m['events_applied']} "
                    f"snapshot=v{m['snapshot_version']}"
                )

        # futs is CLOSED OVER by _gap_tombstones/_gap_task, so the dict
        # must exist before the first submit — fill it incrementally, never
        # via a comprehension assigned after.  Phase-B (gap) tasks live in
        # their OWN pool: they block on main-pool futures, and main-pool
        # tasks block on nothing, so the wait graph is bipartite and
        # acyclic — no deadlock at any pool size — while delete batches'
        # gap jobs overlap each other and the main pipeline instead of
        # chaining through the prepare futures.
        # Overlapped L0→L1 folds (round 6, guide §2.6): on a bulk run
        # the commit-path fold lands at the run's LAST commit — ~3.5 s
        # of a ~10.8 s 8-batch replay spent serialized while the
        # prepare pool sits idle.  Instead, once enough commits have
        # landed that a fold is inevitable this run (d + remaining ≥
        # max_deltas), fold at the half-max_deltas point: the fold's
        # Spark job backfills cores behind the remaining batches'
        # prepares (FIFO scheduling — the in-flight prepares keep
        # priority, the fold soaks up their straggler tails), and a
        # final fold after the last commit leaves the run fully folded
        # (L0 empty — same end state a fold-at-max run would reach,
        # reached cheaper).  Steady single-batch ticks never trigger
        # this (remaining = 0), so the deployment hot path is
        # untouched; folds are opportunistic (a SnapshotConflict from a
        # concurrent writer skips the fold — the commit-path trigger
        # still bounds L0 at max_deltas regardless).
        from dlt_spark.lakehouse import SnapshotConflict

        fold_at = (
            max(1, table.max_deltas // 2)
            if early_fold_at is None
            else max(1, early_fold_at)
        )
        did_early_fold = False

        futs: dict = {}
        gap_futs: dict = {}
        with ThreadPoolExecutor(max_workers=max(1, max_inflight)) as pool, \
                ThreadPoolExecutor(max_workers=max(2, max_inflight)) as gap_pool:
            for b, lo, hi in work:
                futs[b] = pool.submit(_prepare, b, lo, hi)
                if b in del_batches and cascade_mode != "markers":
                    gap_futs[b] = gap_pool.submit(_gap_task, b, lo, hi)
            try:
                for i, (batch_id, lo, hi) in enumerate(work):
                    if fail_after_batches is not None and i >= fail_after_batches:
                        raise RuntimeError(f"injected crash before batch {batch_id}")
                    if stop_requested is not None and stop_requested():
                        break  # graceful: last commit is the resume point
                    _commit_one(batch_id, lo, hi, futs[batch_id].result())
                    rem = len(work) - i - 1
                    if rem > 0:
                        d = len(table._snap["deltas"])
                        # (a "fold the rest behind the last prepare"
                        # tail fire was tried and measured WORSE —
                        # 9.68 vs 9.30 s medians — the last prepare is
                        # nearly done by then, so the extra fold just
                        # serializes; keep the single mid-run fire)
                        if d >= fold_at and d + rem >= table.max_deltas:
                            try:
                                table.fold_pending()
                                did_early_fold = True
                            except SnapshotConflict:
                                pass  # a rival writer folds/commits; skip
            finally:
                for f in futs.values():
                    f.cancel()
                for f in gap_futs.values():
                    f.cancel()
        if did_early_fold and table._snap["deltas"]:
            try:
                table.fold_pending()
            except SnapshotConflict:
                pass

        wall = time.monotonic() - t0
        return RunResult(
            job_id,
            len(batches),
            applied,
            skipped,
            ev_read,
            ev_applied,
            dels,
            wall,
            manifests,
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(_shuf_prev))
