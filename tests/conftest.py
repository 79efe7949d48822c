import pytest

from pdf_extraction_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="pdf-extraction-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
