"""Property-based test (SURVEY §5, bounded for speed): for random op
sequences, the engine's final table equals the per-key fold of ops in
(commit_seq, op-priority) order."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from dlt_spark.operators.dedup import dedup_lww
from dlt_spark.schemas import CHANGE_EVENT_SCHEMA

OPS = st.sampled_from(["I", "U", "D"])


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    events = []
    for i in range(n):
        events.append(
            {
                "commit_seq": draw(st.integers(min_value=0, max_value=15)),
                "doc_id": draw(st.sampled_from(["a", "b", "c"])),
                "op": draw(OPS),
                "tokens": [i],  # payload tied to arrival index
                "payload": None,
                "payload_version": 1,
                "source": "s",
                "extracted_at": None,
            }
        )
    return events


def _oracle_winner(events):
    """Reference semantics: max (commit_seq, op_rank, tie) per key —
    tie on identical (seq, rank) is resolved by the engine's stable
    hash, so the oracle only asserts (seq, rank), not the payload."""
    rank = {"I": 1, "U": 2, "D": 3}
    out = {}
    for e in events:
        k = e["doc_id"]
        key = (e["commit_seq"], rank[e["op"]])
        if k not in out or key > out[k]:
            out[k] = key
    return out


@settings(max_examples=12, deadline=None)
@given(event_logs())
def test_dedup_lww_matches_fold(spark_global, events):
    df = spark_global.createDataFrame(events, CHANGE_EVENT_SCHEMA)
    got = {
        r["doc_id"]: (r["commit_seq"], {"I": 1, "U": 2, "D": 3}[r["op"]])
        for r in dedup_lww(df).collect()
    }
    assert got == _oracle_winner(events)
