import pytest


@pytest.fixture(scope="session")
def spark():
    from extractor.session import get_spark

    s = get_spark(master="local[4]", app_name="tests", shuffle_partitions=4)
    yield s
    s.stop()
