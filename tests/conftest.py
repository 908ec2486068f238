from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from helium_arango_etl_lite_spark.session import get_spark

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # local[4] measured FASTER than local[8] for this suite (r14: the
    # job-latency-bound walk/persist tests read 85 s at 4 cores vs
    # 118-166 s at 8 in back-to-back runs — the suite's cost is tiny-
    # task scheduling, which more threads make worse, not better), so
    # the core count stays at 4; SPARK_GRAFT_TEST_CPUS overrides per
    # environment without a code edit.
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")
    s = get_spark(
        app_name="tests", master=f"local[{cpus}]", shuffle_partitions=8
    )
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMALL
