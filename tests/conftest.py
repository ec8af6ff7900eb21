from __future__ import annotations

import pathlib

import pytest

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "index.html"


@pytest.fixture(scope="session")
def spark():
    from mechaml_spark.session import get_spark

    s = get_spark(app_name="mechaml_spark_tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_html() -> str:
    return FIXTURE.read_text()
