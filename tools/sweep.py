"""Full catalog-vs-DuckDB-oracle sweep (the verify recipe, scripted).

Runs EVERY `queries()` entry against its `oracle_sql()` twin at one
scale factor and writes a JSON report: per-entry row counts, value
hashes, and match verdicts. Exit 1 on any mismatch.

Usage:
    python tools/sweep.py [sf_dir] [out.json]
defaults: /root/testdata/sf0.01, stdout only.
"""

from __future__ import annotations

import hashlib
import json
import math
import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def vhash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
    rows = [
        "|".join(
            "%.6f" % v if isinstance(v, float) and not math.isnan(v)
            else str(v)
            for v in r
        )
        for r in pdf.itertuples(index=False)
    ]
    return hashlib.md5("\n".join(sorted(rows)).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, os_ = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    report: dict[str, dict] = {}
    bad = []
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001 — report, don't die
            report[name] = {"error": f"spark: {ex}"[:300]}
            bad.append(name)
            continue
        entry: dict = {
            "rows": len(spdf),
            "sec": round(time.time() - t0, 2),
        }
        if name in os_:
            try:
                dpdf = con.execute(os_[name]).fetchdf()
            except Exception as ex:  # noqa: BLE001
                entry["error"] = f"duckdb: {ex}"[:300]
                report[name] = entry
                bad.append(name)
                continue
            entry["oracle_rows"] = len(dpdf)
            entry["match"] = (
                len(spdf) == len(dpdf) and vhash(spdf) == vhash(dpdf)
            )
            if not entry["match"]:
                bad.append(name)
        else:
            entry["match"] = "rows-only"
        report[name] = entry
        status = entry.get("match")
        print(f"{name}: rows={entry['rows']} match={status}", flush=True)

    n_oracled = sum(1 for v in report.values() if v.get("match") in (True, False))
    n_green = sum(1 for v in report.values() if v.get("match") is True)
    print(f"\n{n_green}/{n_oracled} oracled entries green; "
          f"{len(report)} total; bad={bad}")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
