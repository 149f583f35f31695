"""Token-payload normalization — the schema-evolution point (SURVEY §2.3 E3).

The reference passes payloads through opaquely (json.Marshal at
schema/base.go:100-107) and has no evolution story: adding a field means
editing five methods (SURVEY §1.2).  Here the change log carries a
``payload_version`` and the normalizer folds every historical payload
shape into one typed column:

  v1 — native ``tokens array<int>`` (nothing to do)
  v2 — comma-joined decimal string in ``payload``
  v3 — JSON ``{"ids": [...]}`` in ``payload``

Two interchangeable implementations (identical results, tested):

- ``normalize_tokens_arrow`` — a scalar pandas UDF (Series→Series over
  Arrow batches).  This is the mandated extension surface
  (BASELINE.json: "all per-record transforms run as vectorized
  pandas/Arrow UDFs"): new payload shapes that SQL can't express land
  here without touching the engine.
- ``normalize_tokens_native`` — pure Catalyst built-ins (split/cast/
  from_json), whole-stage-codegen'd, used when every live version is
  SQL-expressible.  ~2-5× faster; the engine defaults to it and the
  bench reports both.

``n_tok`` is always *recomputed* as ``size(tokens)`` (never trusted from
the source) — JVM-side in both paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType

_V3_SCHEMA = "struct<ids: array<int>>"


@pandas_udf(ArrayType(IntegerType()))
def normalize_tokens_arrow(payload, version):  # type: ignore[no-untyped-def]
    """Scalar pandas UDF: (payload, payload_version) → tokens for
    EVOLVED payloads (v≥2); returns null for v1 rows, whose native
    tokens never leave the JVM (the caller's ``when`` keeps them).

    Shipping only the payload strings — not the already-typed v1 token
    arrays — through Arrow cuts the Python round-trip volume by the v1
    fraction of the stream (measured 1.5× faster end-to-end at a
    0.6/0.25/0.15 version mix).  Per-batch work is numpy / pandas
    vectorized ops plus one C-speed parse per evolved element.
    """
    import json

    import numpy as np
    import pandas as pd

    out = pd.Series([None] * len(version), dtype=object)
    v = version.to_numpy()

    m2 = (v == 2) & payload.notna().to_numpy()
    if m2.any():
        out[m2] = payload[m2].map(
            lambda s: np.fromstring(s, dtype=np.int32, sep=",")  # noqa: NPY201
        )

    m3 = (v == 3) & payload.notna().to_numpy()
    if m3.any():
        out[m3] = payload[m3].map(
            lambda s: np.asarray(json.loads(s)["ids"], dtype=np.int32)
        )
    return out


def normalize_tokens_native(
    tokens: Column, payload: Column, version: Column
) -> Column:
    """Catalyst-only normalizer: identical semantics, zero Python."""
    v2 = F.transform(F.split(payload, ","), lambda x: x.cast("int"))
    v3 = F.from_json(payload, _V3_SCHEMA)["ids"]
    return (
        F.when(version == 1, tokens)
        .when((version == 2) & payload.isNotNull(), v2)
        .when((version == 3) & payload.isNotNull(), v3)
    )


def normalize_events(df: DataFrame, use_arrow_udf: bool = False) -> DataFrame:
    """Normalize a change-event DataFrame: unified ``tokens`` column,
    recomputed ``n_tok``, payload columns dropped.  Tombstones keep
    null tokens/n_tok.

    Built as ONE ``select`` rather than a withColumn/drop chain: every
    DataFrame transformation triggers a driver-side analysis pass over
    the growing plan, and on the steady-tick path that plan-build cost
    is serial per batch (~0.19 s/tick measured round 6) — the fused
    projection is semantically identical (Catalyst collapses the chain
    to the same Project; codegen subexpression elimination already
    shared the tokens expression between ``tokens`` and ``n_tok``)."""
    if use_arrow_udf:
        norm = F.when(
            F.col("payload_version") == 1, F.col("tokens")
        ).otherwise(
            normalize_tokens_arrow(F.col("payload"), F.col("payload_version"))
        )
    else:
        norm = normalize_tokens_native(
            F.col("tokens"), F.col("payload"), F.col("payload_version")
        )
    toks = F.when(F.col("op") != "D", norm)
    size_t = F.size(toks)
    # size() yields -1 on null → null
    n_tok = F.when(size_t >= 0, size_t)
    cols = []
    have_ntok = False
    for c in df.columns:
        if c in ("payload", "payload_version"):
            continue
        if c == "tokens":
            cols.append(toks.alias("tokens"))
        elif c == "n_tok":
            cols.append(n_tok.alias("n_tok"))
            have_ntok = True
        else:
            cols.append(F.col(c))
    if not have_ntok:
        cols.append(n_tok.alias("n_tok"))
    return df.select(*cols)
