import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from one_one_one_rule_spark.session import get_spark
from one_one_one_rule_spark.sources.fixtures import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "artifacts: pins committed sweep/bench artifacts to the live "
        "registry — fails until the slow full-registry refreshes are "
        "rerun after a new @register; deselect for the fast inner loop "
        'with -m "not artifacts" (round-10 ADVICE)',
    )


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=4,
        # test_scaling reads shuffle-write records off the status REST API
        # across MANY stages; match scaling_probe's retention so a
        # stage-heavy session can't evict post-snapshot stages and
        # undercount (honored only at JVM launch, like driver.memory)
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    yield s


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
