import pytest

from lotus_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lotus_spark_tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def sentiment_df(spark):
    """F1 fixture — reference ``.github/tests/lm_tests.py:63-70``."""
    return spark.createDataFrame(
        [("I am really excited to go to class today!",), ("I am very sad",)],
        ["Text"],
    )


@pytest.fixture()
def courses_df(spark):
    """F2 fixture — reference ``tests/test_filter.py:8-25``."""
    rows = [
        ("Introduction to Programming", "CS", 100),
        ("Advanced Programming", "CS", 200),
        ("Cooking Basics", "Culinary", 100),
        ("Advanced Culinary Arts", "Culinary", 200),
        ("Data Structures", "CS", 300),
        ("Algorithms", "CS", 300),
        ("French Cuisine", "Culinary", 200),
        ("Italian Cooking", "Culinary", 200),
    ]
    return spark.createDataFrame(rows, ["Course Name", "Department", "Level"])
