"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``nycdb_k8s_loader_spark``; this module only
adapts the catalog to the driver's calling convention.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from nycdb_k8s_loader_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (wow_bldgs shape) on /root/testdata/sf0.001."""
    from nycdb_k8s_loader_spark.plans.flagship import flagship_bldgs

    return flagship_bldgs(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (ANSI SQL on the same parquet)."""
    return catalog.oracle_sql()
