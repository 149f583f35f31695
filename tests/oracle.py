"""Pure-pandas CDC oracle (SURVEY §5): the expected final table is the
sequential fold of the change log in (commit_seq, op-priority) order.
Independent of every engine code path — no Spark imports.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

_OP_RANK = {"I": 1, "U": 2, "D": 3}


def normalize_tokens_pd(row) -> list[int] | None:
    if row["op"] == "D":
        return None
    v = row["payload_version"]
    if v == 1:
        t = row["tokens"]
        return None if t is None else [int(x) for x in t]
    if row["payload"] is None:
        return None
    if v == 2:
        return [int(x) for x in row["payload"].split(",")]
    return [int(x) for x in json.loads(row["payload"])["ids"]]


def fold_expected_state(events: pd.DataFrame) -> pd.DataFrame:
    """events: collected change log (any order). Returns the expected
    final table sorted by doc_id: (doc_id, tokens, n_tok, source,
    _commit_seq)."""
    ev = events.copy()
    ev["_rank"] = ev["op"].map(_OP_RANK)
    ev = ev.sort_values(["commit_seq", "_rank"], kind="mergesort")
    state: dict[str, tuple] = {}
    for row in ev.to_dict("records"):
        if row["op"] == "D":
            state.pop(row["doc_id"], None)
        else:
            toks = normalize_tokens_pd(row)
            state[row["doc_id"]] = (
                toks,
                len(toks) if toks is not None else None,
                row["source"],
                row["commit_seq"],
            )
    out = pd.DataFrame(
        [
            {
                "doc_id": k,
                "tokens": v[0],
                "n_tok": v[1],
                "source": v[2],
                "_commit_seq": v[3],
            }
            for k, v in state.items()
        ]
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def assert_table_matches(actual: pd.DataFrame, expected: pd.DataFrame) -> None:
    """Row-by-row equality incl. token-array equality (BASELINE.json
    input_hint: per-row invariant is token-array equality)."""
    act = actual.sort_values("doc_id").reset_index(drop=True)
    assert len(act) == len(expected), f"row count {len(act)} != {len(expected)}"
    assert list(act["doc_id"]) == list(expected["doc_id"])
    assert list(act["source"]) == list(expected["source"])
    assert [int(x) for x in act["_commit_seq"]] == [
        int(x) for x in expected["_commit_seq"]
    ]
    assert [int(x) for x in act["n_tok"]] == [int(x) for x in expected["n_tok"]]
    for i, (a, e) in enumerate(zip(act["tokens"], expected["tokens"])):
        a_arr = np.asarray(a, dtype=np.int64)
        e_arr = np.asarray(e, dtype=np.int64)
        assert a_arr.shape == e_arr.shape and (a_arr == e_arr).all(), (
            f"token mismatch at row {i} doc_id={act['doc_id'][i]}"
        )
