import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


def pytest_collection_modifyitems(config, items):
    """Default profile excludes @pytest.mark.slow (r11 verdict #1: the
    full battery grew past the driver's verify budget, so the driver got
    NO pytest verdict at all). A plain `pytest tests/` run deselects the
    slow tests; an explicit -m expression or SPARK_GRAFT_FULL_TESTS=1
    runs whatever was asked."""
    if os.environ.get("SPARK_GRAFT_FULL_TESTS"):
        return
    if config.option.markexpr:
        return
    selected, deselected = [], []
    for item in items:
        (deselected if item.get_closest_marker("slow")
         else selected).append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected


@pytest.fixture(scope="session")
def spark():
    from melt_spark.session import get_spark

    s = get_spark("melt-spark-tests", master="local[4]",
                  extra_conf={
                      "spark.sql.shuffle.partitions": "4",
                      "spark.sql.warehouse.dir": "/tmp/melt_spark_warehouse",
                  })
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
