"""Query catalog plumbing.

Every implemented operator from SURVEY.md §2 registers a
:class:`QuerySpec`: a Spark callable ``(spark, sf_dir) -> DataFrame``
plus (where SQL-expressible) an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet — the driver's correctness gate
(BASELINE.md "t2"). Column names are aliased identically on both sides
because the driver's compare hashes values after sorting columns by
name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # None => non-SQL-expressible; rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    """Decorator: add a Spark query fn + oracle twin to the catalog."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports)."""
    from nycdb_k8s_loader_spark.plans import (  # noqa: F401
        curation_queries,
        extended_queries,
        flagship,
        pipeline_queries,
        relational_queries,
        scale_queries,
        temporal_queries,
        wow_pipeline,
        xlsx_pipeline,
    )


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in QUERIES.items()
        if spec.oracle is not None
    }
