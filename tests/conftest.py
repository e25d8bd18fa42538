import os

import pytest


@pytest.fixture(scope="session")
def spark():
    from gopie_spark.plans import get_spark
    s = get_spark("gopie_spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
