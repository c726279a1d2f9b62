#!/usr/bin/env python
"""Spot-check named catalog queries against their DuckDB oracles —
the same row-count/value-hash compare as ``bench.py --sweep`` but for
an explicit subset, so an optimization loop can verify equivalence in
seconds instead of sweeping all 168 entries.

Usage: python tools/check_queries.py q1 q2 ...   [env SPARK_GRAFT_SWEEP_DIR]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def vhash(pdf) -> str:
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    rows = [
        "|".join(
            "%.6f" % v
            if isinstance(v, float) and not math.isnan(v)
            else str(v)
            for v in r
        )
        for r in pdf.itertuples(index=False)
    ]
    return hashlib.md5("\n".join(sorted(rows)).encode()).hexdigest()


def main() -> None:
    import duckdb

    from nycdb_k8s_loader_spark.plans.catalog import QUERIES, _load_all
    from nycdb_k8s_loader_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SWEEP_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="check-queries")
    _load_all()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    for name in sys.argv[1:]:
        spec = QUERIES[name]
        spdf = spec.fn(spark, sf_dir).toPandas()
        if spec.oracle is None:
            print(f"{name}: {len(spdf)} rows (no oracle)")
            continue
        dpdf = con.execute(spec.oracle).fetchdf()
        ok = len(spdf) == len(dpdf) and vhash(spdf) == vhash(dpdf)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} "
              f"(spark {len(spdf)} rows, oracle {len(dpdf)} rows)")
        failures += 0 if ok else 1
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
