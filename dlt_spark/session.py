"""SparkSession factory with scale-oriented defaults.

Replaces the reference's hand-tuned concurrency/memory knobs
(utils/config_template.yml:59-81 — csv_worker_count, channel_size,
max_ram_gb) with Spark's own machinery: AQE, adaptive shuffle-partition
coalescing, skew-join splitting, and Arrow for the pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the sandbox (local[32], 128 GiB). On a real cluster
# these are overridden via spark-submit --conf; nothing here is
# local-mode-specific.
_BASE_CONF: dict[str, str] = {
    # AQE: runtime re-planning — coalesce small shuffle partitions,
    # split skewed ones (SURVEY §2.7 X4: the reference has no skew
    # handling at all; one huge bundle stalls a worker).
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow is mandatory: BASELINE.json requires vectorized pandas/Arrow
    # UDFs only — no per-row Python anywhere.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Keep partition counts sane for both local[8] and local[32]; AQE
    # coalesces down when volumes are small.
    "spark.sql.shuffle.partitions": "32",
    # Timestamps in the change log are UTC by definition
    # (reference stamps RFC3339 UTC at loader/service.go:144).
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "dlt_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox;
    on a cluster, leave it unset and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_BASE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
