#!/usr/bin/env python
"""Interleaved A/B measurement of the r13 clip-stage hoist
(geo06/07/10/11/12/14): ring open/CCW normalization, clip-edge
builds and pregate bboxes precomputed once per row/element instead
of re-evaluated per candidate pair (convex_clip_ring_pre +
_enrich_subj_ring/_enrich_fan_tri + staged residual edges).

"old" restores the pre-hoist builders (loaded from the committed
geo module shapes, reproduced below via the still-present
normalizing wrappers); timing protocol identical to
tools/ab_geo_paircond.py.

Usage: python tools/ab_geo_clipstage.py geo06_polygon_clip_area ...
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nycdb_k8s_loader_spark.operators import geo  # noqa: E402
from nycdb_k8s_loader_spark.plans.catalog import queries  # noqa: E402
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402

NEW = {
    "polygon_clip_area_join": geo.polygon_clip_area_join,
    "polygon_intersection_join_binned": geo.polygon_intersection_join_binned,
    "multipolygon_clip_area_join": geo.multipolygon_clip_area_join,
    "_fan_clip_area_tail": geo._fan_clip_area_tail,
}


def old_polygon_clip_area_join(
    polys, clips, wkt_col="geom_wkt", clip_wkt_col="clip_wkt",
    area_col="clip_area", round_dp=6,
):
    overlap = set(polys.columns) & set(clips.columns)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    p = geo._with_bbox(polys, wkt_col, "__vp")
    c = geo._with_bbox(clips, clip_wkt_col, "__vc")
    bbox = geo._bbox_overlap("__vp", "__vc")
    fenced_clip = F.when(
        F.spark_partition_id() >= 0,
        geo.convex_clip_ring(F.col("__vp"), F.col("__vc")),
    )
    area = geo.ring_area(F.col("__clipped"))
    if round_dp is not None:
        area = F.round(area, round_dp)
    hidden = [x for x in p.columns + c.columns if x.startswith("__v")]
    return (
        p.join(F.broadcast(c), bbox, "inner")
        .withColumn("__clipped", fenced_clip)
        .withColumn(area_col, area)
        .filter(F.col(area_col) > 0)
        .drop("__clipped", *hidden)
    )


def old_polygon_intersection_join_binned(
    polys_a, polys_b, wkt_a="geom_wkt", wkt_b="geom_wkt", cell_deg=None
):
    overlap = set(polys_a.columns) & set(polys_b.columns)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    a = geo._with_bbox(polys_a, wkt_a, "__va")
    b = geo._with_bbox(polys_b, wkt_b, "__vb")
    cell_deg = geo._derive_cell_deg(
        (a, "__va"), (b, "__vb"), cell_deg=cell_deg
    )
    cell = F.lit(float(cell_deg))
    ab = geo._grid_binned(a, "__va", cell)
    bb = geo._grid_binned(b, "__vb", cell)
    joined = ab.hint("shuffle_hash").join(
        bb,
        (F.col("__va_cx") == F.col("__vb_cx"))
        & (F.col("__va_cy") == F.col("__vb_cy")),
        "inner",
    )
    canonical = (
        F.col("__va_cx")
        == F.floor(F.greatest("__va_x0", "__vb_x0") / cell)
    ) & (
        F.col("__va_cy")
        == F.floor(F.greatest("__va_y0", "__vb_y0") / cell)
    )
    isect = F.when(
        F.spark_partition_id() >= 0,
        geo.polygons_intersect(F.col("__va"), F.col("__vb")),
    )
    hidden = [
        c
        for c in joined.columns
        if c.startswith("__va") or c.startswith("__vb")
    ]
    return (
        joined.filter(geo._bbox_overlap("__va", "__vb") & canonical)
        .withColumn("__isect", isect)
        .filter(F.col("__isect"))
        .drop("__isect", *hidden)
    )


def old_multipolygon_clip_area_join(
    polys, clips, wkt_col="geom_wkt", clip_wkt_col="clip_wkt",
    area_col="clip_area", round_dp=6,
):
    overlap = set(polys.columns) & set(clips.columns)
    if overlap:
        raise ValueError(f"rename overlapping columns first: {overlap}")
    p = geo._with_bbox(polys, wkt_col, "__vp")
    signed = geo._signed_clip_rings(geo.parse_wkt_geometry(clip_wkt_col))
    c0 = clips.select("*", F.explode(signed).alias("__cr"))
    ring = F.col("__cr").getField("ring")
    xs = F.transform(ring, lambda pt: pt["x"])
    ys = F.transform(ring, lambda pt: pt["y"])
    c = c0.select(
        "*",
        F.array_min(xs).alias("__cr_x0"),
        F.array_max(xs).alias("__cr_x1"),
        F.array_min(ys).alias("__cr_y0"),
        F.array_max(ys).alias("__cr_y1"),
    )
    bbox = geo._bbox_overlap("__vp", "__cr")
    fenced_clip = F.when(
        F.spark_partition_id() >= 0,
        geo.convex_clip_ring(F.col("__vp"), ring),
    )
    term = (
        F.col("__cr").getField("sign").cast("long")
        * F.round(geo.ring_area(F.col("__clipped")) * 1e6).cast("long")
    )
    group_cols = list(polys.columns) + list(clips.columns)
    area = F.col("__sum_micro") / F.lit(1e6)
    if round_dp is not None:
        area = F.round(area, round_dp)
    return (
        p.join(F.broadcast(c), bbox, "inner")
        .withColumn("__clipped", fenced_clip)
        .withColumn("__term", term)
        .groupBy(*group_cols)
        .agg(F.sum("__term").alias("__sum_micro"))
        .withColumn(area_col, area)
        .filter(F.col(area_col) > 0)
        .drop("__sum_micro")
    )


def old_fan_clip_area_tail(
    cand, group_cols, area_col, round_dp, keep_all_pairs=False
):
    subj_rings = geo._signed_clip_rings(F.col("__gp"))
    tris_b = geo._signed_fan_triangles(F.col("__gc"))
    fenced_clip = F.when(
        F.spark_partition_id() >= 0,
        geo.convex_clip_ring(
            F.col("__sr").getField("ring"),
            F.col("__tb").getField("ring"),
        ),
    )
    term = (
        F.col("__sr").getField("sign")
        * F.col("__tb").getField("w")
    ).cast("long") * F.round(
        geo.ring_area(F.col("__clipped")) * 1e8
    ).cast("long")
    area = F.col("__sum_micro") / F.lit(1e8)
    if round_dp is not None:
        area = F.round(area, round_dp)
    pregate = geo._ring_bbox_overlap(
        F.col("__sr").getField("ring"),
        F.col("__tb").getField("ring"),
    )
    if keep_all_pairs:
        guarded_clip = F.when(
            pregate & (F.spark_partition_id() >= 0),
            geo.convex_clip_ring(
                F.col("__sr").getField("ring"),
                F.col("__tb").getField("ring"),
            ),
        )
        return (
            cand
            .withColumn("__sr", F.explode_outer(subj_rings))
            .withColumn("__tb", F.explode_outer(tris_b))
            .withColumn("__clipped", guarded_clip)
            .withColumn("__term", term)
            .groupBy(*group_cols)
            .agg(F.sum("__term").alias("__sum_micro"))
            .withColumn(
                area_col,
                F.when(F.col("__sum_micro") > 0, area).otherwise(
                    F.lit(0.0)
                ),
            )
            .drop("__sum_micro")
        )
    return (
        cand
        .withColumn("__sr", F.explode(subj_rings))
        .withColumn("__tb", F.explode(tris_b))
        .filter(pregate)
        .withColumn("__clipped", fenced_clip)
        .withColumn("__term", term)
        .groupBy(*group_cols)
        .agg(F.sum("__term").alias("__sum_micro"))
        .filter(F.col("__sum_micro") > 0)
        .withColumn(area_col, area)
        .drop("__sum_micro")
    )


OLD = {
    "polygon_clip_area_join": old_polygon_clip_area_join,
    "polygon_intersection_join_binned": old_polygon_intersection_join_binned,
    "multipolygon_clip_area_join": old_multipolygon_clip_area_join,
    "_fan_clip_area_tail": old_fan_clip_area_tail,
}


def set_variant(which: str) -> None:
    src = OLD if which == "old" else NEW
    for name, fn in src.items():
        setattr(geo, name, fn)


def main() -> None:
    names = sys.argv[1:]
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-geo-clipstage")
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
