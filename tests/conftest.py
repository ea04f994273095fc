import pytest


@pytest.fixture(scope="session")
def spark():
    from corenlp_spark.session import get_spark

    s = get_spark(
        app_name="corenlp_spark_tests",
        master="local[4]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
