import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from linkgraph.session import get_spark

    s = get_spark(
        "linkgraph-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.warehouse.dir": "/tmp/lg-test-warehouse",
        },
    )
    yield s
    s.stop()


@pytest.fixture()
def edges_df(spark):
    """Factory: python edge list → DataFrame[src, dst]."""

    def make(edges):
        return spark.createDataFrame(edges, "src long, dst long")

    return make
