#!/usr/bin/env python
"""Measure named headline queries with bench.py's exact per-query
protocol (retry-until-steal-clean, median-of-warm-runs, build/exec
split) without running the whole headline set — the optimization
loop's before/after instrument.

Usage: [SPARK_GRAFT_BENCH_RUNS=5] python tools/bench_one.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from nycdb_k8s_loader_spark.plans.catalog import queries  # noqa: E402
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-one")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    out = {}
    for name in names:
        # warm-up pass (JIT/codegen), untimed — the bench pair
        # protocol's warm-up sweep equivalent
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = bench._measure_query(
            spark, qs, name, sf_dir, n_runs,
            clean_jiffies=500, clean_rate_jps=50.0, max_attempts=4,
        )
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
