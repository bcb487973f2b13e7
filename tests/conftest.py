import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    session = (
        SparkSession.builder.master("local[4]")
        .appName("trs-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    session.sparkContext.setLogLevel("ERROR")
    yield session


@pytest.fixture()
def tmp_images(tmp_path):
    """Six readable fake image files (the synthetic loader only needs
    readable bytes)."""
    paths = []
    for i in range(6):
        p = tmp_path / f"img{i}.dat"
        p.write_bytes(bytes([i]) * 32)
        paths.append(str(p))
    return paths
