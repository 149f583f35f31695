from __future__ import annotations

import pytest

from dlt_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "dlt-tests",
        master="local[4]",
        extra_conf={
            "spark.sql.shuffle.partitions": "8",
            "spark.default.parallelism": "8",
        },
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_global(request):
    """Alias usable inside hypothesis @given tests (function-scoped
    fixtures don't mix with hypothesis; session scope does)."""
    return request.getfixturevalue("spark")
