from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from jpspark.session import get_spark

    s = get_spark(app_name="jpspark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
