#!/usr/bin/env python
"""Capture the EXECUTED (AQE-final) formatted plan for named catalog
queries into plans/<tag>/<query>_<suffix>.txt.

Unlike capture_plans.py (static plan), this runs the query through the
noop sink first so `AdaptiveSparkPlan isFinalPlan=true` sections show
the join strategies AQE actually picked from runtime statistics —
needed when the optimization claim is "AQE converts this join at
runtime" rather than a static-plan shape change.

Usage: python tools/capture_final_plan.py <tag> <suffix> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nycdb_k8s_loader_spark.plans.catalog import queries  # noqa: E402
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="capture-final-plans")
    qs = queries()
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        # collect() executes THIS DataFrame's QueryExecution (a write
        # would spawn its own), so the AdaptiveSparkPlan we explain
        # below is the finalized one (isFinalPlan=true).
        df.collect()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan.splitlines())} lines, "
              f"{plan.count('Exchange')} Exchange, "
              f"{plan.count('BroadcastHashJoin')} BHJ, "
              f"{plan.count('SortMergeJoin')} SMJ, "
              f"isFinalPlan=true x{plan.count('isFinalPlan=true')} -> {path}")


if __name__ == "__main__":
    main()
