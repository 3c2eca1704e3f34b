import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .appName("validr_spark_tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "backend_matrix: dual-backend (expression vs pandas-UDF) parity "
        "lane — run alone with `pytest -m backend_matrix`")
    config.addinivalue_line(
        "markers",
        "slow: multi-JVM / spark-submit end-to-end tests (~1-2 min); "
        "deselect with `pytest -m 'not slow'`")
