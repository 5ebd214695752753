import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


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
