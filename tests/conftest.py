import pytest

from scespet_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="scespet-spark-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
