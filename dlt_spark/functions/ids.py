"""Deterministic surrogate row ids (SURVEY §2.3 E2).

The reference mints a fresh uuid per output row at serialization time
(schema/base.go:28, schema/height.go:29) — non-deterministic, which
breaks replay idempotency and row-level diffing.  The engine derives the
id from identity: same (doc_id, commit_seq) → same id, on every replay,
on every cluster.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def deterministic_row_id(doc_id: Column, commit_seq: Column) -> Column:
    return F.sha2(F.concat_ws("|", doc_id, commit_seq.cast("string")), 256)
