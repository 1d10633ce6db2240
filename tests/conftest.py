import pytest

from centimators_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("centimators-tests", cpus=8, shuffle_partitions=8)
    yield s
