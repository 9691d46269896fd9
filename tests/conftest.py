import pytest


@pytest.fixture(scope="session")
def spark():
    from karta_spark.session import get_spark
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
