import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("TEST_ORACLE_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from d_sparq_spark.session import build_session

    s = build_session(app_name="d-sparq-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
