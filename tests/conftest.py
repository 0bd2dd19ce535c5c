import pytest

from lexoid_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("lexoid_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
