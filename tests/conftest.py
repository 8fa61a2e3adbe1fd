from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from riot_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = f"{TESTDATA}/sf0.001"
SF_CORRECT = f"{TESTDATA}/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("riot_spark_tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


def tokens_df(spark, rows):
    """rows: list of (doc_id, term, positions) — external-tokens fixture."""
    data = [(int(d), t, float(len(p)), list(p)) for d, t, p in rows]
    return spark.createDataFrame(
        data, "doc_id LONG, term STRING, tf FLOAT, positions ARRAY<INT>"
    )
