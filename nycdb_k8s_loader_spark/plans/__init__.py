"""Query catalog: each operator from SURVEY.md §2 as a (Spark fn, DuckDB oracle) pair."""

from nycdb_k8s_loader_spark.plans.catalog import QUERIES, QuerySpec, queries, oracle_sql

__all__ = ["QUERIES", "QuerySpec", "queries", "oracle_sql"]
