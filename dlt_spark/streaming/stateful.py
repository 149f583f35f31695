"""Custom stateful streaming operator: running per-key LWW winner via
``applyInPandasWithState`` (SURVEY §2.10 grouped-map surface).

The MoR table already gives convergent LWW through storage; this
operator provides the *in-stream* form — a continuously maintained
"current winner per doc_id" that downstream consumers can subscribe to
without reading the table (e.g. cache invalidation, freshness probes).

State per key: (commit_seq, op_rank) of the winner so far.  Each epoch
folds its arrivals into the state (vectorized pandas per Arrow batch)
and emits the key's winner iff it changed — an update stream.

Note the same tie-break order as operators/dedup.py: commit_seq, then
op priority D > U > I.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("commit_seq", LongType(), False),
        StructField("op_rank", IntegerType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("commit_seq", LongType(), False),
        StructField("op_rank", IntegerType(), False),
    ]
)

_RANK = {"I": 1, "U": 2, "D": 3}


def _update(key, pdfs, state):
    import pandas as pd

    best = tuple(state.get) if state.exists else None
    changed = False
    for pdf in pdfs:
        if not len(pdf):
            continue
        # vectorized argmax over the composite (seq, rank) order: ranks
        # are 1..3 < 4, so seq*4 + rank is order-isomorphic to the tuple
        # (no per-row Python — the BASELINE mandate applies to state
        # folds too; seq < 2^61 keeps the product overflow-free)
        ranks = pdf["op"].map(_RANK).astype("int64")
        seqs = pdf["commit_seq"].astype("int64")
        i = (seqs * 4 + ranks).to_numpy().argmax()
        cand = (int(seqs.iat[i]), int(ranks.iat[i]))
        if best is None or cand > best:
            best = cand
            changed = True
    if changed and best is not None:
        state.update(best)
        yield pd.DataFrame(
            [{"doc_id": key[0], "commit_seq": best[0], "op_rank": best[1]}]
        )


def running_lww_winners(events: DataFrame) -> DataFrame:
    """events: a STREAMING DataFrame with (doc_id, op, commit_seq, …).
    Returns the update stream of per-key winners."""
    return (
        events.select("doc_id", "op", "commit_seq")
        .groupBy("doc_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
