#!/usr/bin/env python
"""Scale-data generator for empirical scale-proofs.

The driver ships deterministic TPC-H-ish parquet only up to sf0.1
(~600k lineitem rows, TESTDATA.md) — nothing in the repo has ever run
above that, so the 100 TB design claims rested on plan reading alone.
This tool synthesizes the SAME ten tables (schema-identical, same
categorical domains, same value ranges, same duplicate structure) at
ANY scale factor, entirely with Spark expressions over
``spark.range`` — distributed, no driver-side loops, deterministic in
(sf, row id) so reruns are bit-identical.

    python tools/gen_scale_data.py --sf 1.0 --out /root/repo/.scaledata/sf1

Row counts scale linearly (sf1 == 10x the driver's sf0.1):

    customer 150k*sf  supplier 10k*sf  part 200k*sf  orders 1.5M*sf
    lineitem 6M*sf    events 1M*sf     documents 50k*sf
    embeddings 20k*sf (region 5 / nation 25 fixed)

Duplicate structure is SCALE-INVARIANT (constant rates, so runtime
ratios between scales measure the operators, not a drifting workload):

- documents: every id % 500 == 3 is an exact copy of id-1; every
  id % 50 == 1 is a 2-word-truncated near-copy of id-1 (high-Jaccard
  pair for d03/d09/d11/t13).
- embeddings: unit-norm 64-dim; every id % 40 == 1 is a small
  perturbation of id-1 (cosine ~0.99+ pair for d12/s-series); vectors
  get label-centered structure so IVF cells are non-degenerate.

Tables are written as a DIRECTORY named ``<table>.parquet`` (Spark
reads those identically to the driver's single files).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["de", "zh", "fr", "es"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "SMALL", "ECONOMY", "PROMO"]
PNOUNS = ["ring", "bolt", "screw", "washer", "plate", "gear", "rod", "cap"]
PADJS = ["large", "hot", "blue", "red", "green", "small", "cold", "dim"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
DIM = 64


def _u(col, salt: int, m: int):
    """Deterministic pseudo-uniform int in [0, m) from (col, salt)."""
    return F.pmod(F.hash(col, F.lit(salt)), F.lit(m))


def _uf(col, salt: int):
    """Deterministic pseudo-uniform double in [0, 1)."""
    return _u(col, salt, 1_000_000) / 1_000_000.0


def _arr(vals: list[str]):
    return F.array(*[F.lit(v) for v in vals])


def _counts(sf: float) -> dict[str, int]:
    return {
        "customer": int(150_000 * sf),
        "supplier": int(10_000 * sf),
        "part": int(200_000 * sf),
        "orders": int(1_500_000 * sf),
        "lineitem": int(6_000_000 * sf),
        "events": int(1_000_000 * sf),
        "documents": int(50_000 * sf),
        "embeddings": int(20_000 * sf),
    }


def gen_region(spark: SparkSession) -> DataFrame:
    return spark.range(5).select(
        F.col("id").cast("int").alias("r_regionkey"),
        F.element_at(_arr(REGIONS), F.col("id").cast("int") + 1).alias(
            "r_name"
        ),
    )


def gen_nation(spark: SparkSession) -> DataFrame:
    return spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        F.pmod(F.col("id"), F.lit(5)).cast("int").alias("n_regionkey"),
    )


def gen_customer(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad(F.col("id"), 9, "0")).alias(
            "c_name"
        ),
        _u(F.col("id"), 1, 25).cast("int").alias("c_nationkey"),
        F.round(_uf(F.col("id"), 2) * 9000 + 100, 2).alias("c_acctbal"),
        F.element_at(_arr(SEGMENTS), _u(F.col("id"), 3, 5) + 1).alias(
            "c_mktsegment"
        ),
    )


def gen_supplier(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad(F.col("id"), 9, "0")).alias(
            "s_name"
        ),
        _u(F.col("id"), 4, 25).cast("int").alias("s_nationkey"),
        F.round(_uf(F.col("id"), 5) * 9000 + 100, 2).alias("s_acctbal"),
    )


def gen_part(spark: SparkSession, n: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            F.element_at(_arr(PADJS), _u(F.col("id"), 6, len(PADJS)) + 1),
            F.lit(" "),
            F.element_at(_arr(PNOUNS), _u(F.col("id"), 7, len(PNOUNS)) + 1),
        ).alias("p_name"),
        F.concat(F.lit("Brand#"), _u(F.col("id"), 8, 25) + 1).alias(
            "p_brand"
        ),
        F.element_at(_arr(PTYPES), _u(F.col("id"), 9, len(PTYPES)) + 1).alias(
            "p_type"
        ),
        (_u(F.col("id"), 10, 50) + 1).cast("int").alias("p_size"),
        F.round(F.lit(900.0) + F.col("id") * 0.1, 2).alias("p_retailprice"),
    )


def gen_orders(spark: SparkSession, n: int, n_cust: int) -> DataFrame:
    return spark.range(n).select(
        F.col("id").alias("o_orderkey"),
        _u(F.col("id"), 11, n_cust).cast("long").alias("o_custkey"),
        F.element_at(
            _arr(["O", "O", "F", "F", "P"]), _u(F.col("id"), 12, 5) + 1
        ).alias("o_orderstatus"),
        F.round(_uf(F.col("id"), 13) * 450_000 + 1_000, 2).alias(
            "o_totalprice"
        ),
        F.date_add(
            F.lit("1995-01-01").cast("date"), _u(F.col("id"), 14, 2400)
        )
        .cast("timestamp_ntz")
        .alias("o_orderdate"),
        F.element_at(
            _arr(PRIORITIES), _u(F.col("id"), 15, len(PRIORITIES)) + 1
        ).alias("o_orderpriority"),
    )


def gen_lineitem(
    spark: SparkSession, n: int, n_orders: int, n_part: int, n_supp: int
) -> DataFrame:
    return spark.range(n).select(
        _u(F.col("id"), 16, n_orders).cast("long").alias("l_orderkey"),
        _u(F.col("id"), 17, n_part).cast("long").alias("l_partkey"),
        _u(F.col("id"), 18, n_supp).cast("long").alias("l_suppkey"),
        (_u(F.col("id"), 19, 7) + 1).cast("int").alias("l_linenumber"),
        (_u(F.col("id"), 20, 50) + 1).cast("double").alias("l_quantity"),
        F.round(_uf(F.col("id"), 21) * 99_000 + 900, 2).alias(
            "l_extendedprice"
        ),
        F.round(_u(F.col("id"), 22, 11) * 0.01, 2).alias("l_discount"),
        F.round(_u(F.col("id"), 23, 9) * 0.01, 2).alias("l_tax"),
        F.element_at(_arr(["A", "N", "R"]), _u(F.col("id"), 24, 3) + 1).alias(
            "l_returnflag"
        ),
        F.element_at(_arr(["O", "F"]), _u(F.col("id"), 25, 2) + 1).alias(
            "l_linestatus"
        ),
        F.date_add(
            F.lit("1995-01-01").cast("date"), _u(F.col("id"), 26, 2500)
        )
        .cast("timestamp_ntz")
        .alias("l_shipdate"),
    )


def gen_events(spark: SparkSession, n: int) -> DataFrame:
    n_users = max(n // 100, 1)
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        (
            F.lit("2024-01-01 00:00:00").cast("timestamp")
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                _u(F.col("id"), 27, 45 * 24 * 3600)
                + _uf(F.col("id"), 28),
            )
        ).cast("timestamp_ntz").alias("ts"),
        _u(F.col("id"), 29, n_users).cast("long").alias("user_id"),
        F.element_at(
            _arr(["view", "click", "purchase", "signup", "error"]),
            _u(F.col("id"), 30, 5) + 1,
        ).alias("event_type"),
        F.round(_uf(F.col("id"), 31) * 560, 2).alias("value"),
        F.concat(
            F.lit('{"k": '), _u(F.col("id"), 32, 100), F.lit("}")
        ).alias("props"),
    )


def gen_documents(spark: SparkSession, n: int) -> DataFrame:
    # Generative dup injection: a dup/near-dup row re-derives its
    # WORDS from the previous id's seed, so no self-join is needed and
    # the rates are constant at every scale.
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.pmod(F.col("id"), F.lit(500)) == 3)
            | (F.pmod(F.col("id"), F.lit(50)) == 1),
            F.col("id") - 1,
        )
        .otherwise(F.col("id"))
        .alias("seed"),
        (F.pmod(F.col("id"), F.lit(50)) == 1).alias("is_near"),
    )
    n_words_seed = _u(F.col("seed"), 33, 100) + 10
    n_words = F.when(
        F.col("is_near"), n_words_seed - 2
    ).otherwise(n_words_seed)
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda j: F.element_at(
                _arr(VOCAB), F.pmod(F.hash(F.col("seed"), j), F.lit(len(VOCAB))) + 1
            ),
        ),
    )
    return base.select(
        "doc_id",
        text.alias("text"),
        F.when(_u(F.col("doc_id"), 34, 10) < 4, F.lit("en"))
        .otherwise(
            F.element_at(_arr(LANGS), _u(F.col("doc_id"), 35, len(LANGS)) + 1)
        )
        .alias("lang"),
        F.concat(F.lit("src"), _u(F.col("doc_id"), 36, 20)).alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def gen_embeddings(spark: SparkSession, n: int) -> DataFrame:
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(F.pmod(F.col("id"), F.lit(40)) == 1, F.col("id") - 1)
        .otherwise(F.col("id"))
        .alias("seed"),
        (F.pmod(F.col("id"), F.lit(40)) == 1).alias("is_near"),
    )
    label = _u(F.col("seed"), 37, 10).cast("int")
    # label-centered structure (so IVF/k-means cells are real): a unit
    # spike at dim (label*6 + 1) blended with per-(seed, dim) noise,
    # plus a tiny per-ID perturbation for near-dup rows only.
    raw = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda j: (
            F.when(j == label * 6 + 1, F.lit(1.2)).otherwise(F.lit(0.0))
            + (F.pmod(F.hash(F.col("seed"), j, F.lit(38)), F.lit(2001)) - 1000)
            / 1000.0
            + F.when(
                F.col("is_near"),
                (
                    F.pmod(F.hash(F.col("vec_id"), j, F.lit(39)), F.lit(201))
                    - 100
                )
                / 5000.0,
            ).otherwise(F.lit(0.0))
        ),
    )
    nrm = F.sqrt(
        F.aggregate(raw, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return base.select(
        "vec_id",
        F.transform(raw, lambda x: (x / nrm).cast("float")).alias(
            "embedding"
        ),
        label.alias("label"),
    )


def generate(spark: SparkSession, sf: float, out: str) -> None:
    c = _counts(sf)
    tables = {
        "region": gen_region(spark),
        "nation": gen_nation(spark),
        "customer": gen_customer(spark, c["customer"]),
        "supplier": gen_supplier(spark, c["supplier"]),
        "part": gen_part(spark, c["part"]),
        "orders": gen_orders(spark, c["orders"], c["customer"]),
        "lineitem": gen_lineitem(
            spark, c["lineitem"], c["orders"], c["part"], c["supplier"]
        ),
        "events": gen_events(spark, c["events"]),
        "documents": gen_documents(spark, c["documents"]),
        "embeddings": gen_embeddings(spark, c["embeddings"]),
    }
    os.makedirs(out, exist_ok=True)
    for name, df in tables.items():
        path = os.path.join(out, f"{name}.parquet")
        df.write.mode("overwrite").parquet(path)
        print(f"wrote {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scaledata",
        f"sf{args.sf:g}",
    )
    from nycdb_k8s_loader_spark.session import get_spark

    spark = get_spark(
        app_name="gen-scale-data",
        extra_conf={
            "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
            # local-mode: driver memory IS the whole JVM heap (the
            # bench_scale convention) — sf10 generation OOMs the 1g
            # default on the events table's 10M-row write
            "spark.driver.memory": os.environ.get(
                "SPARK_GRAFT_DRIVER_MEM", "48g"
            ),
        },
    )
    generate(spark, args.sf, out)


if __name__ == "__main__":
    main()
