from __future__ import annotations

import pytest

from graphql_api_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Tiny fixtures: fewer threads/partitions beat the 32-way default
    # (task-dispatch overhead dominates at this scale).
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle_dir():
    return SF_ORACLE
