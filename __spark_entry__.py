"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` is the smoke check; ``queries()`` / ``oracle_sql()``
expose the engine's full operator registry (web_crawler_spark.analytics.
queries) for the DuckDB-compared correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web_crawler_spark.analytics import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the broadcast dim join +
    rollup (J2/J6/A6-shaped) — stable schema, deterministic values."""
    return Q.queries()["dim_join_rollup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data extensions). Each callable takes (spark, sf_dir)."""
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query; the
    crawl-loop and image-pipeline queries are rows-only (checked against
    the Python oracle / codec invariants in tests/ instead)."""
    return Q.oracle_sql()
