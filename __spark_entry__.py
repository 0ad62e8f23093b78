"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (error-event timechart, SURVEY.md §7.1);
``queries``/``oracle_sql`` expose the full registered surface from
``cses2humio_spark.queries`` (each Spark query paired with its DuckDB
oracle; non-SQL-expressible ops are registered without an oracle and get
the driver's rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cses2humio_spark.queries import QUERIES

    return QUERIES["timechart_errors"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cses2humio_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cses2humio_spark.queries import ORACLES

    return dict(ORACLES)
