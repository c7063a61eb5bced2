import os

import pytest

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF_TEST = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    from hllspark import jvmagg

    builder = (
        SparkSession.builder.master("local[4]")
        .appName("hllspark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
    )
    if os.path.exists(jvmagg.jar_path()):
        # JVM fast path on the classpath: the default impl resolution picks
        # it up, so the whole suite exercises the jvm build path
        builder = builder.config(
            "spark.driver.extraClassPath", jvmagg.jar_path()
        ).config("spark.jars", jvmagg.jar_path())
    session = builder.getOrCreate()
    yield session
    session.stop()
