import pytest

from etl_pipelines_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="etl-pipelines-spark-tests",
        shuffle_partitions=4,
        extra_conf={"spark.master": "local[4]"},
    )
    yield spark
