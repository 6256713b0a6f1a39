from __future__ import annotations

import pytest

from satellite_data_ingestion_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def duck():
    from tests.oracle import duck_con

    con = duck_con(SF_SMOKE)
    yield con
    con.close()
