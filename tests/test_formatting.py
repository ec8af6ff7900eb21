"""Format sample tables ported verbatim (test.ml:444-561 / FIXTURES.md §2).

One Spark job per function: all cases evaluated as literal columns in
a single select.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mechaml_spark import formatting as fmt

COLOR_CASES = [
    ((0, 0, 0), "#000000"),
    ((255, 255, 255), "#FFFFFF"),
    ((128, 128, 128), "#808080"),
    ((30, 75, 145), "#1E4B91"),
    ((-10, 128, 128), None),
    ((300, 128, 128), None),
    ((128, -10, 128), None),
    ((128, 300, 128), None),
    ((128, 128, -10), None),
    ((128, 128, 300), None),
]

DATE_CASES = [
    ((31, 1, 2016), "2016-01-31"),
    ((31, 3, 2016), "2016-03-31"),
    ((31, 5, 2016), "2016-05-31"),
    ((31, 7, 2016), "2016-07-31"),
    ((31, 8, 2016), "2016-08-31"),
    ((31, 12, 2016), "2016-12-31"),
    ((31, 2, 2016), None),
    ((31, 4, 2016), None),
    ((31, 6, 2016), None),
    ((31, 9, 2016), None),
    ((31, 11, 2016), None),
    ((29, 2, 1824), "1824-02-29"),
    ((29, 2, 800), "800-02-29"),  # year NOT zero-padded (test.ml:470)
    ((29, 2, 1823), None),
    ((29, 2, 801), None),
    ((30, 2, 2524), None),
    ((30, 2, 1825), None),
    ((20, 5, -5), None),
    ((20, -1, 2000), None),
    ((20, 15, 2000), None),
    ((-10, 5, 2000), None),
    ((40, 5, 2000), None),
]

TIME_CASES = [
    ((0, 0, 0), "00:00:00"),
    ((10, 20, 30), "10:20:30"),
    ((14, 8, 48), "14:08:48"),
    ((23, 55, 3), "23:55:03"),
    ((-1, 30, 30), None),
    ((35, 30, 30), None),
    ((12, -1, 30), None),
    ((12, 60, 30), None),
    ((12, 30, -1), None),
    ((12, 30, 60), None),
]


def _run_cases(spark, fn, cases):
    df = spark.range(1)
    cols = [
        fn(*[F.lit(v) for v in args]).alias(f"c{i}")
        for i, (args, _exp) in enumerate(cases)
    ]
    row = df.select(*cols).collect()[0]
    return [row[f"c{i}"] for i in range(len(cases))]


def test_color_spark(spark):
    assert _run_cases(spark, fmt.color, COLOR_CASES) == [e for _a, e in COLOR_CASES]


def test_date_spark(spark):
    assert _run_cases(spark, fmt.date, DATE_CASES) == [e for _a, e in DATE_CASES]


def test_time_spark(spark):
    assert _run_cases(spark, fmt.time, TIME_CASES) == [e for _a, e in TIME_CASES]


@pytest.mark.parametrize("cases,fn", [
    (COLOR_CASES, fmt.color_py),
    (DATE_CASES, fmt.date_py),
    (TIME_CASES, fmt.time_py),
])
def test_python_mirror(cases, fn):
    for args, expected in cases:
        assert fn(*args) == expected, args
