"""Run-lifecycle event log — the reference tracks "Sync Started" /
"Sync Finished" events to Segment with an anonymous installation id and
an opt-out flag (utils/events.go:91-116: TrackSyncStarted /
TrackSyncFinished; getUserId persists a uuid under ~/.kyve-dlt/id).

No network exists in the sandbox (and product analytics should not be
a hard dependency anyway), so the analog appends the SAME event shapes
to a local JSONL file a collector can tail/ship: one object per line,
``{"event", "ts", "install_id", "run_id", "properties"}``.  The
installation id is a uuid persisted once under ``~/.dlt_spark/id``
(getUserId's contract); ``DLT_SPARK_NO_TRACK=1`` or ``opt_out=True``
disables emission entirely (the reference's OptOut).  Events are only
written when a sink path is configured — nothing is phoned anywhere by
default."""

from __future__ import annotations

import json
import os
import uuid
from datetime import datetime, timezone


def install_id(state_dir: str | None = None) -> str:
    """Stable anonymous id, created on first use (utils/events.go:47-77
    semantics: mkdir -p the state dir, write the uuid once, reuse)."""
    d = state_dir or os.path.join(os.path.expanduser("~"), ".dlt_spark")
    os.makedirs(d, exist_ok=True)
    p = os.path.join(d, "id")
    if not os.path.exists(p):
        with open(p, "w") as f:
            f.write(uuid.uuid4().hex)
    with open(p) as f:
        return f.read().strip()


class EventLog:
    """Appends lifecycle events to a JSONL sink.

    ``path=None`` (the default when no ``--events-file`` is given) makes
    every emit a no-op — telemetry is strictly opt-in here, inverting
    the reference's opt-out default."""

    def __init__(
        self,
        path: str | None = None,
        run_id: str | None = None,
        opt_out: bool | None = None,
        state_dir: str | None = None,
    ):
        if opt_out is None:
            opt_out = os.environ.get("DLT_SPARK_NO_TRACK", "") == "1"
        self.path = None if opt_out else path
        self.run_id = run_id or uuid.uuid4().hex
        self._install = install_id(state_dir) if self.path else None

    def _emit(self, event: str, properties: dict) -> None:
        if not self.path:
            return
        rec = {
            "event": event,
            "ts": datetime.now(timezone.utc).isoformat(),
            "install_id": self._install,
            "run_id": self.run_id,
            "properties": properties,
        }
        d = os.path.dirname(os.path.abspath(self.path))
        os.makedirs(d, exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec, sort_keys=True) + "\n")

    # the reference's two events (utils/events.go:91-116), same fields
    # where they exist in this engine
    def sync_started(
        self, schema: str, destination: str, seq_from: int | None,
        seq_to: int | None, **extra
    ) -> None:
        self._emit("Sync Started", {
            "schema": schema, "destination": destination,
            "from_seq": seq_from, "to_seq": seq_to, **extra,
        })

    def sync_finished(self, res, **extra) -> None:
        """``res`` is a RunResult; mirrors SyncFinishedProperties
        (duration / bundles_synced → batches / rows synced)."""
        self._emit("Sync Finished", {
            "duration_secs": round(res.wall_secs, 3),
            "batches_synced": res.batches_applied,
            "batches_skipped": res.batches_skipped,
            "events_read": res.events_read,
            "events_applied": res.events_applied,
            "deletes_applied": res.deletes_applied,
            **extra,
        })
