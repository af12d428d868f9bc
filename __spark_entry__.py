"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship PIT backfill query on sf0.001.
queries()     — every implemented operator (SURVEY.md §2) as
                (spark, sf_dir) -> DataFrame builders.
oracle_sql()  — matching DuckDB SQL per query (correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: point-in-time
    training-set assembly (as-of merge of 3 features onto the purchase
    spine in one union-merge pass)."""
    from raptor_spark.queries import q_backfill_wide

    return q_backfill_wide(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from raptor_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from raptor_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
