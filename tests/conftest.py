from __future__ import annotations

import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_MEDIUM = os.environ.get("SPARK_GRAFT_SF_MEDIUM", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from lab3_lakehouse_spark.session import build_session

    # modest thread count for tests: JVM startup dominates, not compute
    spark = build_session(
        app_name="lab3-lakehouse-tests",
        master=f"local[{min(8, os.cpu_count() or 4)}]",
        shuffle_partitions=8,
    )
    yield spark


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_medium() -> str:
    return SF_MEDIUM
