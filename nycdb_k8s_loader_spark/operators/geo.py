"""Geo-lite operators: haversine distance and grid-binned radius joins.

The reference stores float lat/lng on its buildings table
(/root/reference/tests/sql/wow_2021_create_bldgs_table.sql:76-77) and
de-scopes full PostGIS geometry (SURVEY.md §2.1 S6).  This module is
the attribute+coordinate path: everything a housing-analytics workload
does with *point* coordinates — distance, proximity pairs, density —
expressed with built-in column functions only (no UDFs, no Sedona
dependency), so the whole thing stays inside whole-stage codegen.

The scale pattern is the standard geospatial bin-join: snap points to
a grid whose cell edge is at least the search radius, equi-join on the
cell id with the probe side expanded to its 3x3 cell neighborhood, and
apply the exact haversine predicate residually.  That turns an
all-pairs O(n^2) proximity search into one shuffle on the cell key
with only in-neighborhood candidate pairs materialized — the same
shape Sedona/GeoMesa/BigQuery GIS use (S2/geohash cells), built here
from `floor`, `explode` and an equi-join.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # IUGG mean Earth radius
# Degree length used for SIZING grid cells. The haversine sphere's
# true degree length is (pi/180)*R = 111.195 km; the constant here
# must be <= that or the cell edge comes out smaller than the radius
# and boundary pairs silently fall outside the 3x3 neighborhood
# (using the WGS84 equatorial 111.320 did exactly that: edge ~0.11%
# short, a 1.99898 km pair at lat 41 landed 2 cells apart). 111.0
# under-states the degree by ~0.18% — cells slightly larger than
# needed, which only adds candidates, never loses pairs, and dwarfs
# the ~1e-8 curvature slack between arc and great-circle distance.
KM_PER_DEG_SIZING = 111.0
# Backward-compat names (both intentionally the same conservative
# constant — see above; lat and lng degrees are equal on a sphere):
KM_PER_LAT_DEG = KM_PER_DEG_SIZING
KM_PER_LNG_DEG_EQUATOR = KM_PER_DEG_SIZING


def haversine_km(
    lat1: Column, lng1: Column, lat2: Column, lng2: Column
) -> Column:
    """Great-circle distance in km between two (lat, lng) points.

    Pure built-in trig — evaluated JVM-side inside codegen.  The same
    formula written in ANSI SQL (radians/sin/cos/asin/sqrt) is the
    DuckDB oracle twin; both engines evaluate it in IEEE-754 double,
    so results agree to ~1 ulp (queries that compare against a radius
    threshold must not sit exactly on it — pick thresholds with
    margin, as geo01 does).
    """
    dlat = F.radians(lat2 - lat1)
    dlng = F.radians(lng2 - lng1)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat1))
        * F.cos(F.radians(lat2))
        * F.sin(dlng / 2)
        * F.sin(dlng / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def cell_edge_deg(radius_km: float, max_abs_lat_deg: float) -> float:
    """Smallest grid edge (degrees) that covers ``radius_km`` in both
    axes anywhere with \\|lat\\| <= ``max_abs_lat_deg``.

    Longitude degrees shrink by cos(lat), so the edge is sized for the
    *worst* latitude in the data; with edge >= radius in both axes,
    any pair within the radius is guaranteed to fall in adjacent cells
    (3x3 neighborhood) — the correctness invariant of the bin join.
    """
    if not 0 <= max_abs_lat_deg < 89.0:
        raise ValueError("max_abs_lat_deg must be in [0, 89)")
    lat_edge = radius_km / KM_PER_DEG_SIZING
    lng_edge = radius_km / (
        KM_PER_DEG_SIZING * math.cos(math.radians(max_abs_lat_deg))
    )
    return max(lat_edge, lng_edge)


def with_grid_cell(
    df: DataFrame,
    lat: str,
    lng: str,
    edge_deg: float,
    cx: str = "cell_x",
    cy: str = "cell_y",
) -> DataFrame:
    """Snap each point to its integer grid cell (floor division)."""
    return df.withColumn(
        cx, F.floor(F.col(lng) / F.lit(edge_deg)).cast("int")
    ).withColumn(cy, F.floor(F.col(lat) / F.lit(edge_deg)).cast("int"))


def radius_self_join(
    points: DataFrame,
    id_col: str,
    lat: str,
    lng: str,
    radius_km: float,
    max_abs_lat_deg: float,
) -> DataFrame:
    """All unordered pairs of ``points`` within ``radius_km`` of each
    other: (id_a, id_b, dist_km) with id_a < id_b.

    Physical shape: one side keeps its home cell, the other explodes
    to its 3x3 neighborhood (9 rows), and the join is an *equi-join*
    on (cell_x, cell_y) — one shuffle on the cell key, candidate
    pairs bounded by local density, never O(n^2).  The exact
    haversine predicate runs residually on candidates only.  The
    id_a < id_b guard both dedupes the unordered pair and drops
    self-pairs.  At 100 TB: cells partition geographically, so skew
    follows real-world density — salt hot cells (operators/skew.py)
    if one city dominates.
    """
    edge = cell_edge_deg(radius_km, max_abs_lat_deg)
    base = with_grid_cell(points, lat, lng, edge)

    left = base.select(
        F.col(id_col).alias("id_a"),
        F.col(lat).alias("lat_a"),
        F.col(lng).alias("lng_a"),
        "cell_x",
        "cell_y",
    )
    # Probe side: each point claims its neighborhood so any true pair
    # shares at least one (cell_x, cell_y) with the build side.
    right = (
        base
        .select(
            F.col(id_col).alias("id_b"),
            F.col(lat).alias("lat_b"),
            F.col(lng).alias("lng_b"),
            F.explode(
                F.array(*[F.col("cell_x") + d for d in (-1, 0, 1)])
            ).alias("cell_x"),
            "cell_y",
        )
        .select(
            "id_b",
            "lat_b",
            "lng_b",
            "cell_x",
            F.explode(
                F.array(*[F.col("cell_y") + d for d in (-1, 0, 1)])
            ).alias("cell_y"),
        )
    )

    dist = haversine_km(
        F.col("lat_a"), F.col("lng_a"), F.col("lat_b"), F.col("lng_b")
    )
    return (
        left.hint("shuffle_hash").join(right, ["cell_x", "cell_y"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= F.lit(radius_km))
        .select("id_a", "id_b", "dist_km")
    )


def grid_density(
    points: DataFrame, lat: str, lng: str, edge_deg: float
) -> DataFrame:
    """Points-per-cell density with cell centroids — the aggregation
    twin of the bin join (one shuffle on the cell key; partial counts
    map-side)."""
    return (
        with_grid_cell(points, lat, lng, edge_deg)
        .groupBy("cell_x", "cell_y")
        .agg(
            F.count("*").alias("n_points"),
            F.avg(lat).alias("centroid_lat"),
            F.avg(lng).alias("centroid_lng"),
        )
    )


# --- WKT polygons: parse + point-in-polygon, pure expressions ----------------


def parse_wkt_polygon(col: Column | str) -> Column:
    """``POLYGON ((x1 y1, x2 y2, ...))`` → array<struct<x,y>> (outer
    ring only), with pure string/array expressions — no UDF, no
    geometry library. The parse handles the single-ring polygons the
    ``boundaries`` dataset ships (holes/multipolygons are the
    documented Sedona escalation path, SURVEY §2.1 S6)."""
    c = F.col(col) if isinstance(col, str) else col
    inner = F.regexp_extract(c, r"\(\(\s*([^()]*?)\s*\)\)", 1)
    pairs = F.split(inner, r"\s*,\s*")
    return F.transform(
        pairs,
        lambda p: F.struct(
            F.split(F.trim(p), r"\s+")[0].cast("double").alias("x"),
            F.split(F.trim(p), r"\s+")[1].cast("double").alias("y"),
        ),
    )


def point_in_polygon(px: Column, py: Column, verts: Column) -> Column:
    """Ray-casting containment test as a single Catalyst expression:
    count edges whose span crosses the horizontal ray from the point;
    odd crossings = inside. Built from zip_with over the vertex array
    shifted by one (edges) + aggregate (crossing parity) — fully
    codegen'd, O(vertices) per row, zero shuffle, no UDF.

    Points exactly ON an edge are boundary-undefined (standard for
    ray casting); callers comparing against an independent oracle must
    keep test points off edges, as geo04 does by construction."""
    n = F.size(verts)
    a = F.slice(verts, 1, n - 1)
    b = F.slice(verts, 2, n - 1)
    crossings = F.zip_with(
        a,
        b,
        lambda u, v: (
            ((u["y"] > py) != (v["y"] > py))
            & (
                px
                < (v["x"] - u["x"])
                * (py - u["y"])
                / (v["y"] - u["y"])
                + u["x"]
            )
        ).cast("int"),
    )
    total = F.aggregate(
        crossings, F.lit(0), lambda acc, x: acc + x
    )
    return (total % 2) == 1


def tag_points_with_polygons(
    points: DataFrame,
    polygons: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    wkt_col: str = "geom_wkt",
    tag_cols: tuple = ("ntacode",),
) -> DataFrame:
    """Left-tag each point with the polygon containing it (NULL tags
    when none). Polygon sets like NTA boundaries are metadata-scale
    (hundreds of rows) vs data-scale points, so the parsed polygon
    frame BROADCASTS and containment evaluates inside the scan stage
    of the points — zero shuffle of the point side. For huge polygon
    sets, pre-bin both sides on a grid first (radius_self_join's
    pattern) before the residual containment test."""
    polys = polygons.select(
        *tag_cols, parse_wkt_polygon(wkt_col).alias("__verts")
    )
    joined = points.join(
        F.broadcast(polys),
        point_in_polygon(F.col(x_col), F.col(y_col), F.col("__verts")),
        "left",
    )
    return joined.drop("__verts")
