#!/usr/bin/env python
"""Interleaved A/B measurement of the r13 geo parse fence.

Monkeypatches geo._with_bbox/_with_geom_bbox back to their unfenced
pre-r13 forms ("old") and times each named query old/new alternately
in ONE session (same JVM, same warmup state), noop sink, so the
comparison is insensitive to slow drift in background load.

Usage: python tools/ab_geo_fence.py geo06_polygon_clip_area ...
       [SPARK_GRAFT_AB_ROUNDS=2]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from nycdb_k8s_loader_spark.operators import geo  # noqa: E402
from nycdb_k8s_loader_spark.plans.catalog import queries  # noqa: E402
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402

NEW_WITH_BBOX = geo._with_bbox
NEW_WITH_GEOM_BBOX = geo._with_geom_bbox


def old_with_bbox(df: DataFrame, wkt: str, vcol: str) -> DataFrame:
    verts = geo.parse_wkt_polygon(wkt)
    xs = F.transform(verts, lambda p: p["x"])
    ys = F.transform(verts, lambda p: p["y"])
    return df.select(
        "*",
        verts.alias(vcol),
        F.array_min(xs).alias(f"{vcol}_x0"),
        F.array_max(xs).alias(f"{vcol}_x1"),
        F.array_min(ys).alias(f"{vcol}_y0"),
        F.array_max(ys).alias(f"{vcol}_y1"),
    )


def old_with_geom_bbox(df: DataFrame, wkt: str, gcol: str) -> DataFrame:
    geom = geo.parse_wkt_geometry(wkt)
    verts = F.flatten(F.flatten(geom))
    xs = F.transform(verts, lambda p: p["x"])
    ys = F.transform(verts, lambda p: p["y"])
    return df.select(
        "*",
        geom.alias(gcol),
        F.array_min(xs).alias(f"{gcol}_x0"),
        F.array_max(xs).alias(f"{gcol}_x1"),
        F.array_min(ys).alias(f"{gcol}_y0"),
        F.array_max(ys).alias(f"{gcol}_y1"),
    )


def set_variant(which: str) -> None:
    if which == "old":
        geo._with_bbox = old_with_bbox
        geo._with_geom_bbox = old_with_geom_bbox
    else:
        geo._with_bbox = NEW_WITH_BBOX
        geo._with_geom_bbox = NEW_WITH_GEOM_BBOX


def main() -> None:
    names = sys.argv[1:]
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-geo-fence")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    out: dict[str, dict] = {}
    for name in names:
        times: dict[str, list[float]] = {"old": [], "new": []}
        # one un-timed warmup per variant, then interleaved timed runs
        for which in ("old", "new"):
            set_variant(which)
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        for _ in range(rounds):
            for which in ("old", "new"):
                set_variant(which)
                spark.sparkContext.setJobDescription(f"{name}:{which}")
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[which].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        o = statistics.median(times["old"])
        n = statistics.median(times["new"])
        out[name] = {
            "old_runs": [round(t, 3) for t in times["old"]],
            "new_runs": [round(t, 3) for t in times["new"]],
            "old_median": round(o, 3),
            "new_median": round(n, 3),
            "speedup": round(o / n, 3),
        }
        print(f"{name}: old {o:.3f}s new {n:.3f}s  x{o / n:.2f}",
              flush=True)
    set_variant("new")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
