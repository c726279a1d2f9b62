"""Session function registry (SURVEY.md §2 U2 / O2).

The reference's SQL scripts declare persistent Postgres functions
(``CREATE OR REPLACE FUNCTION``) and re-create them after every
publish swap (/root/reference/load_dataset.py:372-376,
wowutil.py:170-181). OSS Spark has no durable function catalog, so the
engine mirrors the same pattern at the session level: a registry of
named functions re-applied on session start / after publish.

Two function kinds:

- **SQL-expression functions** — Spark 3.5+ ``CREATE TEMPORARY
  FUNCTION ... RETURNS ... RETURN <expr>`` (pure Catalyst expressions,
  codegen'd, zero Python).
- **Python scalar functions** — ``spark.udf.register`` escape hatch
  for logic that cannot be an expression (kept off hot paths).

The Postgres ``first()`` ordered-aggregate (wow_2021 sql:21-23) is NOT
registered as a function: SQL UDAFs don't exist in OSS Spark, and the
engine's discipline is to rewrite it to built-in ``max_by``/``min_by``
with an explicit tiebreak (SURVEY §2 A7) — see
operators.relational.arg_max.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import SparkSession


def _trigram_expr(var: str) -> str:
    """Trigram-set SQL for one argument (pg_trgm padding; mirrors
    functions.text_similarity.trigrams)."""
    padded = f"concat('  ', lower(trim({var})), ' ')"
    return (
        f"array_distinct(transform(sequence(1, length({padded}) - 2), "
        f"i -> substring({padded}, i, 3)))"
    )


TRIGRAM_SIMILARITY_SQL = f"""
CREATE OR REPLACE TEMPORARY FUNCTION trigram_similarity(a STRING, b STRING)
RETURNS DOUBLE
RETURN CASE
    WHEN size(array_union({_trigram_expr('a')}, {_trigram_expr('b')})) = 0
    THEN 0.0
    ELSE size(array_intersect({_trigram_expr('a')}, {_trigram_expr('b')}))
         / size(array_union({_trigram_expr('a')}, {_trigram_expr('b')}))
END
"""

SLUGIFY_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION slugify(s STRING)
RETURNS STRING
RETURN lower(regexp_replace(trim(s), '\\\\W+', '-'))
"""

WS_FINGERPRINT_SQL = """
CREATE OR REPLACE TEMPORARY FUNCTION ws_fingerprint(s STRING)
RETURNS STRING
RETURN md5(regexp_replace(lower(trim(s)), '\\\\s+', ' '))
"""


@dataclass
class FunctionDef:
    name: str
    create_sql: str | None = None
    python_fn: Callable | None = None
    return_type: str = "string"


class FunctionRegistry:
    """Named functions re-registered per session — the engine calls
    :meth:`apply` at session start and after every publish, exactly
    where the reference re-runs its function SQL.

    Besides scalar functions, the registry resolves named TABLE
    functions — driver-side callables ``(spark, *args) → DataFrame``
    for the reference's table-valued lookups
    (get_corporate_owner_info_for_regid, wow.get_assoc_addrs_from_bbl
    — functions/reference_fns.py), which no Spark UDF kind can host
    because they query catalog tables."""

    def __init__(self) -> None:
        self._fns: dict[str, FunctionDef] = {}
        self._table_fns: dict[str, Callable] = {}

    def add(self, fn: FunctionDef) -> None:
        self._fns[fn.name] = fn

    def add_table_fn(self, name: str, fn: Callable) -> None:
        self._table_fns[name] = fn

    def table_fn(self, name: str) -> Callable:
        """Lookup; raises KeyError with the known names on a miss (the
        probe-for-existence contract the reference tests rely on)."""
        if name not in self._table_fns:
            raise KeyError(
                f"no table function {name!r}; registered: "
                f"{sorted(self._table_fns)}"
            )
        return self._table_fns[name]

    def names(self) -> list[str]:
        return list(self._fns)

    def table_fn_names(self) -> list[str]:
        return list(self._table_fns)

    def materialize_table_fn_calls(self, spark: SparkSession, sql: str) -> str:
        """Make registered table functions SQL-invocable: rewrite
        ``FROM <name>(<literal args>)`` calls in ``sql`` into temp-view
        references, evaluating each call once (driver-side, the only
        place a catalog-querying table function can run) and
        registering the result under a deterministic view name. The
        reference's users call these inside scripts
        (``SELECT ... FROM wow.get_assoc_addrs_from_bbl('xxx')``,
        reference tests/test_wowutil.py:42-44); unregistered names and
        non-literal arguments pass through untouched."""
        import hashlib

        import re as _re

        from nycdb_k8s_loader_spark.publish.transpile import (
            rewrite_table_fn_calls,
        )

        def resolve(name: str, args: list):
            if name not in self._table_fns:
                return None
            slug = _re.sub(r"\W+", "_", name)
            tag = hashlib.md5(repr(args).encode()).hexdigest()[:8]
            view = f"__tablefn_{slug}_{tag}"
            self._table_fns[name](spark, *args).createOrReplaceTempView(view)
            return view

        return rewrite_table_fn_calls(sql, resolve)

    def apply(self, spark: SparkSession) -> list[str]:
        applied = []
        for fn in self._fns.values():
            if fn.create_sql:
                spark.sql(fn.create_sql)
            elif fn.python_fn is not None:
                spark.udf.register(fn.name, fn.python_fn, fn.return_type)
            applied.append(fn.name)
        return applied


def default_registry() -> FunctionRegistry:
    reg = FunctionRegistry()
    reg.add(FunctionDef("trigram_similarity", TRIGRAM_SIMILARITY_SQL))
    reg.add(FunctionDef("slugify", SLUGIFY_SQL))
    reg.add(FunctionDef("ws_fingerprint", WS_FINGERPRINT_SQL))
    return reg
