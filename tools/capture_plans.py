#!/usr/bin/env python
"""Capture .explain('formatted') for named catalog queries into
plans/<tag>/<query>_<suffix>.txt (the optimization-round evidence
contract: the judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> <suffix> <query> [query ...]
       python tools/capture_plans.py r13 before --headline
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
    spark = get_spark(app_name="capture-plans")
    qs = queries()
    if names == ["--headline"]:
        import bench

        names = list(bench.HEADLINE)
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, "
              f"{n_exch} Exchange mentions -> {path}")


if __name__ == "__main__":
    main()
