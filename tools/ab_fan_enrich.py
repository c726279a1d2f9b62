#!/usr/bin/env python
"""Interleaved A/B for the r13 fourth-pass per-ELEMENT staging of the
concave tail's enrich builders (geo11/geo12/geo14): the old form
bound ring intermediates as Python variables — spliced expression
TREES that interpreted HOF lambdas re-evaluate at every reference
(fan origin/base per VERTEX, CCW per edge-enumeration reference) —
the new form stages each intermediate through its own transform so it
is computed once per element and bound as a lambda-variable field.

"old" reconstructs the pre-change builders verbatim; timing protocol
identical to tools/ab_geo_clipstage.py.

Usage: python tools/ab_fan_enrich.py geo11_concave_clip_area ...
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

NEW = {"_fan_clip_area_tail": geo._fan_clip_area_tail}


def old_signed_fan_triangles(geom):
    """Pre-change tree-spliced form."""
    def tris_of(sr):
        ring = geo._open_ring(sr["ring"])
        o = ring[0]
        base = sr["sign"].cast("double") * F.signum(
            geo._signed_shoelace(ring)
        )
        tris = F.zip_with(
            ring,
            geo._rotated(ring),
            lambda u, v: F.struct(
                F.array(o, u, v).alias("ring"),
                (
                    base
                    * F.signum(
                        (u["x"] - o["x"]) * (v["y"] - o["y"])
                        - (u["y"] - o["y"]) * (v["x"] - o["x"])
                    )
                ).cast("int").alias("w"),
            ),
        )
        return F.filter(tris, lambda t: t["w"] != 0)

    return F.flatten(
        F.transform(geo._signed_clip_rings(geom), tris_of)
    )


def old_enrich_subj_ring(sr):
    r = sr["ring"]
    xs = F.transform(r, lambda p: p["x"])
    ys = F.transform(r, lambda p: p["y"])
    return F.struct(
        geo._ccw(geo._open_ring(r)).alias("ring"),
        sr["sign"].alias("sign"),
        F.array_min(xs).alias("x0"),
        F.array_max(xs).alias("x1"),
        F.array_min(ys).alias("y0"),
        F.array_max(ys).alias("y1"),
    )


def old_enrich_fan_tri(t):
    r = t["ring"]
    xs = F.transform(r, lambda p: p["x"])
    ys = F.transform(r, lambda p: p["y"])
    return F.struct(
        geo._ring_edges(geo._ccw(r)).alias("edges"),
        t["w"].alias("w"),
        F.array_min(xs).alias("x0"),
        F.array_max(xs).alias("x1"),
        F.array_min(ys).alias("y0"),
        F.array_max(ys).alias("y1"),
    )


def old_fan_clip_area_tail(
    cand, group_cols, area_col, round_dp, keep_all_pairs=False
):
    """The committed pre-change tail (per-element enrich functions)."""
    subj_rings = F.transform(
        geo._signed_clip_rings(F.col("__gp")), old_enrich_subj_ring
    )
    tris_b = F.transform(
        old_signed_fan_triangles(F.col("__gc")), old_enrich_fan_tri
    )
    fenced_clip = F.when(
        F.spark_partition_id() >= 0,
        geo.convex_clip_ring_pre(
            F.col("__sr").getField("ring"),
            F.col("__tb").getField("edges"),
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
    sr, tb = F.col("__sr"), F.col("__tb")
    pregate = (
        (sr.getField("x0") < tb.getField("x1"))
        & (tb.getField("x0") < sr.getField("x1"))
        & (sr.getField("y0") < tb.getField("y1"))
        & (tb.getField("y0") < sr.getField("y1"))
    )
    if keep_all_pairs:
        guarded_clip = F.when(
            pregate & (F.spark_partition_id() >= 0),
            geo.convex_clip_ring_pre(
                F.col("__sr").getField("ring"),
                F.col("__tb").getField("edges"),
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


OLD = {"_fan_clip_area_tail": old_fan_clip_area_tail}


def set_variant(which: str) -> None:
    src = OLD if which == "old" else NEW
    for name, fn in src.items():
        setattr(geo, name, fn)


def main() -> None:
    names = sys.argv[1:]
    rounds = int(os.environ.get("SPARK_GRAFT_AB_ROUNDS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-fan-enrich")
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
