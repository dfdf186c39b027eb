import pytest

from ai_data_matching_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield s


@pytest.fixture(scope="session")
def pages_small(spark):
    from ai_data_matching_spark.synth import generate_pages

    return generate_pages(spark, 400, seed=42).cache()


@pytest.fixture(scope="session")
def labels_small(spark):
    from ai_data_matching_spark.synth import generate_labeled_pairs

    return generate_labeled_pairs(spark, 400, seed=42).cache()
