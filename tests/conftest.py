import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.appName("topojson_spark_tests")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.maxPlanStringLength", "100000")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    yield s
    s.stop()


# reference-defaults for stage-level parity tests: Join/Cut/Dedup/Hashmap
# constructed directly use TopoOptions defaults (utils.py:15-101):
# prequantize=False, winding_order=None, shared_coords=False
STAGE_DEFAULTS = dict(prequantize=False, winding_order=None)
