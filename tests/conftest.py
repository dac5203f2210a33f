import sys

import pytest

sys.path.insert(0, "/root/repo")

from db_migrator_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    import tempfile

    s = get_spark(
        "pytest",
        master="local[4]",
        shuffle_partitions=4,
        driver_memory="4g",
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-wh-")},
    )
    yield s
    s.stop()
