import pytest

from geospatial_web_scraper_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="gwss-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
