"""Batch planning + the incremental runner (the reference's loader loop)."""

from dlt_spark.plans.runner import run_incremental, plan_batches, RunResult  # noqa: F401
