import os

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test startup light
    from ocrs_spark.session import get_spark

    spark = get_spark(app_name="ocrs_spark_tests", shuffle_partitions=8)
    yield spark
    spark.stop()
