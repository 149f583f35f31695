"""Change-log sources: deterministic synthetic generator + range-scan reader."""

from dlt_spark.sources.generator import generate_change_log  # noqa: F401
from dlt_spark.sources.changelog import read_change_log_range  # noqa: F401
