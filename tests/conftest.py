from __future__ import annotations

import pytest

from squonk2_fastapi_ws_event_stream_spark.session import get_spark

SMOKE_SF_DIR = "/root/testdata/sf0.001"
ORACLE_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("squonk2-spark-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SMOKE_SF_DIR
