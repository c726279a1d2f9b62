#!/usr/bin/env python
"""Build-phase profiler (guide §1: measure first).

The bench's ``value`` channel = build + exec; at r13 start build is
~14 s of the 21 s headline — dominated by eager actions inside query
builders (localCheckpoint stage fences, convergence-loop counts,
k-means collects). This tool monkeypatches every eager DataFrame
action with a timing wrapper that records duration + the repo-side
call site, runs the requested queries once (warm), and prints a
per-action breakdown, so optimization effort lands on the actual
hot eager actions instead of guesses.

Usage: python tools/profile_eager.py d09_fuzzy_dedup_e2e c07_...
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: pyspark.sql.DataFrame is the abstract facade; instances are
# the classic concrete class, which overrides every action — patch it.
from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402

from nycdb_k8s_loader_spark.plans.catalog import queries  # noqa: E402
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402

EVENTS: list[tuple[str, str, float]] = []  # (action, site, sec)


def _site() -> str:
    for frame in reversed(traceback.extract_stack()):
        fn = frame.filename
        if "nycdb_k8s_loader_spark" in fn and "profile_eager" not in fn:
            return f"{os.path.basename(fn)}:{frame.lineno}:{frame.name}"
    return "?"


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig(self, *a, **kw)
        EVENTS.append((name, _site(), time.perf_counter() - t0))
        return out

    setattr(cls, name, timed)


def main() -> None:
    for action in ("localCheckpoint", "count", "collect", "isEmpty",
                   "toPandas", "head", "take"):
        _wrap(DataFrame, action)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-eager")
    spark.range(1000).selectExpr("sum(id)").collect()
    EVENTS.clear()
    qs = queries()
    names = sys.argv[1:]
    for qname in names:
        # warm-up (JIT/codegen) pass, not recorded
        qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
        EVENTS.clear()
        t0 = time.perf_counter()
        df = qs[qname](spark, sf_dir)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        print(f"\n=== {qname}: build={t1 - t0:.3f}s exec={t2 - t1:.3f}s "
              f"(warm, single run)")
        acc: dict[tuple[str, str], list[float]] = {}
        for action, site, sec in EVENTS:
            acc.setdefault((action, site), []).append(sec)
        rows = sorted(acc.items(), key=lambda kv: -sum(kv[1]))
        tracked = sum(sec for _, _, sec in EVENTS)
        print(f"    tracked eager actions: {tracked:.3f}s "
              f"in {len(EVENTS)} calls")
        for (action, site), secs in rows:
            print(f"    {sum(secs):7.3f}s  n={len(secs):3d}  "
                  f"{action:16s} {site}")
        EVENTS.clear()


if __name__ == "__main__":
    main()
