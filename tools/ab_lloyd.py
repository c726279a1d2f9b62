#!/usr/bin/env python
"""A/B the d12 Lloyd-refinement loop variants (r14, guide §1).

Same-JVM interleaved timing of semantic_dedup's driver-bounded
training phase (seeds + lloyd rounds + flat assignment NOOP'd), with
trajectory-identical plan variants:

  base    - committed code (spread vecs, per-round scan re-execution)
  ckpt    - vecs localCheckpointed once; rounds read blocks
  fence   - ckpt + AQE off / shuffle clamp for the round queries

The centroid trajectories are asserted equal across variants.

Usage: python tools/ab_lloyd.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nycdb_k8s_loader_spark.operators import similarity as S  # noqa: E402
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_vecs(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return S._spread_small_scan(
        emb.select(
            F.col("vec_id").alias("vid"),
            S.as_double_vec("embedding").alias("v"),
        ),
        "vid",
    )


def train(vecs, k=8, iters=2):
    seed_rows = vecs.orderBy("vid").limit(k).collect()
    cents = [list(r["v"]) for r in seed_rows]
    return S._lloyd_refine(vecs, cents, iters)


def run_base(spark):
    vecs = load_vecs(spark)
    cents = train(vecs)
    S._assign_flat(vecs, cents).write.format("noop").mode(
        "overwrite"
    ).save()
    return cents


def run_ckpt(spark):
    vecs = load_vecs(spark).localCheckpoint(eager=True)
    cents = train(vecs)
    S._assign_flat(vecs, cents).write.format("noop").mode(
        "overwrite"
    ).save()
    vecs.unpersist()
    return cents


def run_fence(spark):
    vecs = load_vecs(spark).localCheckpoint(eager=True)
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        cents = train(vecs)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_sp)
    S._assign_flat(vecs, cents).write.format("noop").mode(
        "overwrite"
    ).save()
    vecs.unpersist()
    return cents


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark(app_name="ab-lloyd")
    variants = {"base": run_base, "ckpt": run_ckpt, "fence": run_fence}
    # warm-up + trajectory pin
    ref = None
    for name, fn in variants.items():
        c = fn(spark)
        if ref is None:
            ref = c
        assert c == ref, f"{name} trajectory diverged"
    times: dict[str, list[float]] = {n: [] for n in variants}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fn(spark)
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ts = sorted(ts)
        print(f"{name:6s} median={ts[len(ts)//2]:.3f}s  all={[round(t,3) for t in ts]}")


if __name__ == "__main__":
    main()
