"""Column builders and vectorized (Arrow) UDFs — the only Python that
ever touches data, per BASELINE.json (no per-row Python UDFs anywhere).
"""

from dlt_spark.functions.normalize import (  # noqa: F401
    normalize_events,
    normalize_tokens_arrow,
    normalize_tokens_native,
)
from dlt_spark.functions.ids import deterministic_row_id  # noqa: F401
