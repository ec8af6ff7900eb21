"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship extraction query at sf0.001;
``queries``/``oracle_sql`` expose the engine operators of
SURVEY.md §2 (+ §2.11 training-data ops) with DuckDB oracles —
implementations live in mechaml_spark/queries.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mechaml_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: HTML synthesis -> parse UDF -> link extraction ->
    per-lang counts at sf0.001 (driver checks rows > 0)."""
    return QUERIES["extract_links"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
