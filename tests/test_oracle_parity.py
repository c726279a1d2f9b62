"""Local mirror of the driver's correctness gate (BASELINE.md t2).

For every catalog query with an oracle: run the Spark DataFrame and
the DuckDB SQL on the same parquet, sort columns by name and rows by
value, and compare cell-by-cell. Floats compare exactly when both
sides round explicitly (the catalog convention) with a tiny tolerance
fallback for summation-order ulps.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from nycdb_k8s_loader_spark.plans.catalog import QUERIES, queries, oracle_sql
from tests.conftest import SF_SMALL

ALL_QUERIES = queries()
ORACLES = oracle_sql()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]) or pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    assert list(s.columns) == list(d.columns), (
        f"{name}: column mismatch spark={list(s.columns)} duck={list(d.columns)}"
    )
    assert len(s) == len(d), f"{name}: rowcount spark={len(s)} duck={len(d)}"
    for c in s.columns:
        sv, dv = s[c].tolist(), d[c].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert a == b or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9), (
                    f"{name}: float diff col={c} row={i}: {a!r} != {b!r}"
                )
            else:
                assert (a == b) or (pd.isna(a) and pd.isna(b)), (
                    f"{name}: value diff col={c} row={i}: {a!r} != {b!r}"
                )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck_sf001):
    spark_df = ALL_QUERIES[name](spark, SF_SMALL)
    spark_pdf = spark_df.toPandas()
    duck_pdf = duck_sf001.execute(ORACLES[name]).fetchdf()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ORACLES)))
def test_oracle_less_query_runs(name, spark):
    df = ALL_QUERIES[name](spark, SF_SMALL)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_documented():
    for name, spec in QUERIES.items():
        assert spec.doc, f"{name} missing doc"
