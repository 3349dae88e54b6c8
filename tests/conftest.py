import pytest

from jsschema_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="jsschema_spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s
    s.stop()
