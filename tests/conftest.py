import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("TEST_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Default = FAST profile (r12, VERDICT r11 #1): the suite outgrew the
    driver's verify window (1117 tests, ~40 min idle — VERIFY_r11
    truncated at ~64% with zero failures), so the heavyweight laps are
    marked `slow` and skipped unless explicitly requested. They are NOT
    redundant — run them via D_SPARQ_FULL_TESTS=1 before shipping; the
    DuckDB sweep additionally runs standalone as tools/emit_local_oracle.py
    (the LOCAL_ORACLE artifacts), which is why the default profile can
    afford to skip it."""
    if os.environ.get("D_SPARQ_FULL_TESTS") == "1":
        return
    if config.getoption("-m"):
        return  # explicit marker expression: the user chose, respect it
    skip = pytest.mark.skip(
        reason="slow-profile lap: D_SPARQ_FULL_TESTS=1 or -m slow runs it"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from d_sparq_spark.session import build_session

    wh = tmp_path_factory.mktemp("spark-warehouse")
    s = build_session(
        app_name="d-sparq-spark-tests",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s
    s.stop()
