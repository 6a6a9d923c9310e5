"""Driver contract for the spark-graft builder (PySpark target).

Thin adapters over the ``als_hadoop_spark`` engine package: ``entry``
runs the flagship query, ``queries()`` exposes every implemented
operator from SURVEY.md §2 Part C, ``oracle_sql()`` the DuckDB twins.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from als_hadoop_spark import operators, streaming


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped hash aggregate, SURVEY.md §7.1
    M0) on /root/testdata/sf0.001."""
    return operators.relational.q_groupby_sum(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 Part C."""
    out = operators.all_queries()
    out.update(streaming.QUERIES)
    return operators.order_for_driver(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB ANSI-SQL twins; keys absent here are deliberately
    rows-only (sketches, LSH, random split, ML fit — SURVEY.md §7.3)."""
    out = operators.all_oracles()
    out.update(streaming.ORACLES)
    return out
