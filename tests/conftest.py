import pytest


@pytest.fixture(scope="session")
def spark():
    from ssgp_toolbox_spark.session import get_spark

    s = get_spark("ssgp-tests", master="local[4]",
                  extra_confs={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
