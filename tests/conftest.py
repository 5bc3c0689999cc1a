import pytest


@pytest.fixture(scope="session")
def spark():
    from marc2rdf_spark.session import get_spark

    s = get_spark(app_name="marc2rdf_spark_tests", cores=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
