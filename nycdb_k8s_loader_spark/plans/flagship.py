"""Flagship query — the wow_bldgs shape on the synthetic star schema.

Re-expresses the reference's flagship transformation
(/root/reference/tests/sql/wow_2021_create_bldgs_table.sql: 4 CTEs,
7 left joins against aggregation subqueries, DISTINCT ON, filtered
counts, ordered json_agg, coalesce+casts) with TPC-H-ish stand-ins
(FIXTURES.md §4): customer ≈ registrations fact, orders ≈
violations/complaints detail, lineitem ≈ ACRIS amounts, the
latest-order-per-customer ≈ firstdeeds latest-per-bbl.

Scale notes: every aggregate is a map-side-combinable groupBy on the
join key; the per-customer aggregate dims are small relative to the
fact, so AQE broadcasts them into the final join pipeline (the analog
of the reference's 7-way join at wow_2021 sql:89-125, where Postgres
relies on b-tree indexes — wow_2021 sql:130-131 — and we rely on
broadcast + AQE instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nycdb_k8s_loader_spark.operators.relational import (
    arg_max,
    coalesce_int,
    count_where,
)
from nycdb_k8s_loader_spark.plans.catalog import register

RECENT_CUTOFF = "1998-03-02"  # dataset-relative analog of CURRENT_DATE - '3 YEARS' (wow_2021 sql:58)

FLAGSHIP_ORACLE = f"""
WITH order_stats AS (
    SELECT
        o_custkey,
        count(*)::BIGINT AS n_orders_raw,
        count(CASE WHEN o_orderstatus = 'O' THEN 1 END)::BIGINT AS n_open_raw,
        count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '{RECENT_CUTOFF} 00:00:00')::BIGINT
            AS n_recent_raw
    FROM orders
    GROUP BY o_custkey
),
latest_order AS (
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_orderprice
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
        ) AS rn
        FROM orders
    ) WHERE rn = 1
),
revenue AS (
    SELECT o_custkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_custkey
),
prio AS (
    SELECT o_custkey,
           string_agg(o_orderpriority || ':' || cnt, ','
                      ORDER BY cnt DESC, o_orderpriority ASC) AS priority_breakdown
    FROM (
        SELECT o_custkey, o_orderpriority, count(*)::BIGINT AS cnt
        FROM orders GROUP BY o_custkey, o_orderpriority
    )
    GROUP BY o_custkey
)
SELECT
    c_custkey,
    c_name,
    c_mktsegment,
    CASE WHEN c_mktsegment IN ('BUILDING', 'AUTOMOBILE') THEN 'industrial'
         ELSE 'consumer' END AS segment_class,
    COALESCE(n_orders_raw, 0)::INT AS total_orders,
    COALESCE(n_open_raw, 0)::INT AS open_orders,
    COALESCE(n_recent_raw, 0)::INT AS recent_orders,
    latest_orderkey,
    latest_orderprice,
    COALESCE(revenue, 0.0) AS revenue,
    priority_breakdown
FROM customer
LEFT JOIN order_stats ON c_custkey = order_stats.o_custkey
LEFT JOIN latest_order ON c_custkey = latest_order.o_custkey
LEFT JOIN revenue ON c_custkey = revenue.o_custkey
LEFT JOIN prio ON c_custkey = prio.o_custkey
"""


@register(
    "flagship_bldgs",
    FLAGSHIP_ORACLE,
    doc=(
        "wow_bldgs analog: fact left-joined to 4 aggregation subqueries "
        "with conditional/filtered counts (A1-A5), latest-per-group via "
        "max_by (A7/D1), ordered string_agg (A8/A11), coalesce+cast "
        "(P11), CASE (P10), date window (P9). Reference: "
        "wow_2021_create_bldgs_table.sql:1-131."
    ),
    tags=("flagship", "join", "agg"),
)
def flagship_bldgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    recent = F.lit(RECENT_CUTOFF).cast("timestamp")

    # ONE map-side-combined shuffle of orders on o_custkey computes the
    # violations-style counts (wow_2021 sql:92-95), the
    # firstdeeds-style latest-per-key (sql:6-26, max_by with a
    # deterministic (date, key) tiebreak), AND the raw material for the
    # ordered string_agg (sql:38-65). The reference (and our first
    # version) built these as three separate aggregate subqueries —
    # three full scans + three shuffles of the fact table; fused, the
    # fact is scanned and shuffled once. At 100 TB this is the
    # difference that matters: the per-key dim stays small either way,
    # but orders does not.
    fused = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders_raw"),
        count_where(F.col("o_orderstatus") == "O").alias("n_open_raw"),
        count_where(F.col("o_orderdate") >= recent).alias("n_recent_raw"),
        arg_max("o_orderkey", "o_orderdate", "o_orderkey").alias("latest_orderkey"),
        arg_max("o_totalprice", "o_orderdate", "o_orderkey").alias("latest_orderprice"),
        F.sort_array(F.collect_list("o_orderpriority")).alias("__prios"),
    )

    # priority breakdown from the collected array, all codegen'd:
    # distinct values (≤ a handful), per-value counts, (count desc,
    # value asc) ordering, "value:count" join — the nested-aggregation
    # shape (per-(key,type) counts → ordered agg per key) without a
    # second shuffle. O(orders_per_key × distinct_types) per row.
    prios = F.col("__prios")
    entries = F.transform(
        F.array_distinct(prios),
        lambda v: F.struct(
            (-F.size(F.filter(prios, lambda x: x == v))).alias("neg_cnt"),
            v.alias("prio"),
        ),
    )
    breakdown = F.array_join(
        F.transform(
            F.array_sort(entries),
            lambda s: F.concat_ws(
                ":", s["prio"], (-s["neg_cnt"]).cast("string")
            ),
        ),
        ",",
    )
    order_dims = fused.select(
        "o_custkey",
        "n_orders_raw",
        "n_open_raw",
        "n_recent_raw",
        "latest_orderkey",
        "latest_orderprice",
        breakdown.alias("priority_breakdown"),
    )

    # money aggregate through a join (docamount shape, wow_2021 sql:9-14).
    revenue = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("revenue")
        )
    )

    return (
        customer.join(order_dims, customer.c_custkey == order_dims.o_custkey, "left")
        .drop("o_custkey")
        # NO join hint here, deliberately (r13, measured): the static
        # plan is a SortMergeJoin (revenue's size estimate inherits
        # orders⋈lineitem — too big to broadcast by stats), but at
        # runtime the per-custkey aggregate is customer-cardinality
        # and AQE rewrites the join to a broadcast from the measured
        # shuffle stats. A shuffle_hash hint pins the strategy and
        # BLOCKS that conversion — measured exec 0.49-0.67 s unhinted
        # vs 0.75-0.84 s hinted at sf0.1 (BENCH_r13_runA-D). Guide
        # §3.1's "pick deliberately" includes leaving AQE the room to
        # pick better from runtime sizes.
        .join(revenue, customer.c_custkey == revenue.o_custkey, "left")
        .drop("o_custkey")
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            F.when(
                F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"), "industrial"
            )
            .otherwise("consumer")
            .alias("segment_class"),
            coalesce_int("n_orders_raw").alias("total_orders"),
            coalesce_int("n_open_raw").alias("open_orders"),
            coalesce_int("n_recent_raw").alias("recent_orders"),
            "latest_orderkey",
            "latest_orderprice",
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            "priority_breakdown",
        )
    )
