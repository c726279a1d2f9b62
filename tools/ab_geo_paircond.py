#!/usr/bin/env python
"""Interleaved A/B measurement of the r13 per-pair-condition hoist
(geo04/05/08/09): bbox pregates on the tagging joins + ring→edge
structures precomputed per ROW instead of rebuilt per candidate-pair
condition evaluation.

Monkeypatches the four join builders back to their pre-hoist forms
("old") and times each named query old/new alternately in ONE
session (same JVM, same warmup state), noop sink — the same
drift-insensitive protocol as tools/ab_geo_fence.py.

Usage: python tools/ab_geo_paircond.py geo04_point_in_polygon ...
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

NEW = {
    "tag_points_with_polygons": geo.tag_points_with_polygons,
    "polygon_intersection_join": geo.polygon_intersection_join,
    "tag_points_with_multipolygons": geo.tag_points_with_multipolygons,
    "multipolygon_intersection_join": geo.multipolygon_intersection_join,
}


def old_tag_points_with_polygons(
    points, polygons, x_col="x", y_col="y", wkt_col="geom_wkt",
    tag_cols=("ntacode",),
):
    polys = polygons.select(
        *tag_cols, geo.parse_wkt_polygon(wkt_col).alias("__verts")
    )
    joined = points.join(
        F.broadcast(polys),
        geo.point_in_polygon(
            F.col(x_col), F.col(y_col), F.col("__verts")
        ),
        "left",
    )
    return joined.drop("__verts")


def old_polygon_intersection_join(
    polys_a, polys_b, wkt_a="geom_wkt", wkt_b="geom_wkt"
):
    a = geo._with_bbox(polys_a, wkt_a, "__va")
    b = geo._with_bbox(polys_b, wkt_b, "__vb")
    bbox = geo._bbox_overlap("__va", "__vb")
    cond = bbox & geo.polygons_intersect(F.col("__va"), F.col("__vb"))
    hidden = [c for c in a.columns + b.columns if c.startswith("__v")]
    return b.join(F.broadcast(a), cond, "inner").drop(*hidden)


def old_tag_points_with_multipolygons(
    points, polygons, x_col="x", y_col="y", wkt_col="geom_wkt",
    tag_cols=("ntacode",),
):
    polys = polygons.select(
        *tag_cols, geo.parse_wkt_geometry(wkt_col).alias("__geom")
    )
    joined = points.join(
        F.broadcast(polys),
        geo.multipolygon_contains(
            F.col(x_col), F.col(y_col), F.col("__geom")
        ),
        "left",
    )
    return joined.drop("__geom")


def old_multipolygon_intersection_join(
    polys_a, polys_b, wkt_a="geom_wkt", wkt_b="geom_wkt"
):
    a = geo._with_geom_bbox(polys_a, wkt_a, "__ga")
    b = geo._with_geom_bbox(polys_b, wkt_b, "__gb")
    bbox = geo._bbox_overlap("__ga", "__gb")
    cond = bbox & geo.multipolygons_intersect(
        F.col("__ga"), F.col("__gb")
    )
    hidden = [c for c in a.columns + b.columns if c.startswith("__g")]
    return b.join(F.broadcast(a), cond, "inner").drop(*hidden)


OLD = {
    "tag_points_with_polygons": old_tag_points_with_polygons,
    "polygon_intersection_join": old_polygon_intersection_join,
    "tag_points_with_multipolygons": old_tag_points_with_multipolygons,
    "multipolygon_intersection_join": old_multipolygon_intersection_join,
}


def set_variant(which: str) -> None:
    src = OLD if which == "old" else NEW
    for name, fn in src.items():
        setattr(geo, name, fn)


def main() -> None:
    names = sys.argv[1:]
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-geo-paircond")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = queries()
    out: dict[str, dict] = {}
    for name in names:
        times: dict[str, list[float]] = {"old": [], "new": []}
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
