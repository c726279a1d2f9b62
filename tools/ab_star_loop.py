#!/usr/bin/env python
"""Interleaved A/B for the r13 second-pass star-contraction rework
(observation convergence riding the checkpoint job + identity
re-canonicalization stages removed + init inside the static fence) —
guide §1: same session, same JVM, per-variant warmup, N timed rounds
each, variants alternating so machine weather hits both equally.

Variant OLD reconstructs the pre-change loop verbatim (init
checkpoints under AQE, per-round greatest/least+distinct stages after
each star step, convergence via two exceptAll set differences + limit
+ count in a separate job). Variant NEW calls the repo's
connected_components_star. Both consume the SAME checkpointed edge
frame (g04's sparse functional graph at $SPARK_GRAFT_SF_DIR), so the
A/B isolates the loop itself.

Usage: python tools/ab_star_loop.py [rounds=3]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nycdb_k8s_loader_spark.operators.graph import (  # noqa: E402
    _iteration_sized_shuffle,
    _large_star,
    _static_loop_plans,
    _symmetrized,
    connected_components_star,
    release_local_checkpoint,
)
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402


def _old_small_star(edges_dir):
    """The pre-change two-select union form."""
    mins = edges_dir.groupBy("u").agg(F.min("v").alias("m"))
    linked = edges_dir.join(mins.hint("shuffle_hash"), "u")
    out = linked.select(
        F.col("v").alias("u"), F.col("m").alias("v")
    ).unionByName(linked.select(F.col("u"), F.col("m").alias("v")))
    return out.filter(F.col("u") != F.col("v")).distinct()


def old_connected_components_star(edges, src="src", dst="dst",
                                  max_rounds=30):
    """The pre-change star loop, verbatim."""
    with _iteration_sized_shuffle(edges, None):
        raw = edges.select(
            F.col(src).alias("u"), F.col(dst).alias("v")
        ).localCheckpoint(eager=True)
        cur = (
            raw.filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"),
                F.least("u", "v").alias("v"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        all_nodes = (
            raw.select(
                F.explode(F.array(F.col("u"), F.col("v"))).alias("node")
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        release_local_checkpoint(raw)
        with _static_loop_plans(edges.sparkSession):
            for _ in range(max_rounds):
                sym = _symmetrized(cur, "u", "v")
                ls = _large_star(sym)
                dir_edges = (
                    ls.select(
                        F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"),
                    )
                    .filter(F.col("u") != F.col("v"))
                    .distinct()
                )
                nxt = _old_small_star(dir_edges)
                nxt = (
                    nxt.select(
                        F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"),
                    )
                    .distinct()
                    .localCheckpoint(eager=True)
                )
                unchanged = (
                    cur.exceptAll(nxt)
                    .unionByName(nxt.exceptAll(cur))
                    .limit(1)
                    .count()
                    == 0
                )
                release_local_checkpoint(cur)
                cur = nxt
                if unchanged:
                    break
            else:
                raise RuntimeError("old star loop did not converge")
            membership = cur.select(
                F.greatest("u", "v").alias("node"),
                F.least("u", "v").alias("component"),
            ).distinct()
            return (
                all_nodes.join(membership, "node", "left")
                .select(
                    "node",
                    F.coalesce("component", F.col("node")).alias(
                        "component"
                    ),
                )
            )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-star-loop")
    spark.range(1000).selectExpr("sum(id)").collect()

    # g04's full sparse functional graph, materialized ONCE outside
    # the timed region
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = 4 * orders.count()
    ok = F.col("o_orderkey")
    edges = (
        orders.select(
            (ok % p).alias("src"), ((ok * 7 + 3) % p).alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = edges.count()

    variants = {
        "old_star": lambda: old_connected_components_star(edges),
        "new_star": lambda: connected_components_star(edges),
    }
    for fn in variants.values():  # warmup (JIT/codegen)
        fn().write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out = fn()
            out.write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            release_local_checkpoint(out)

    print(f"edges={n_edges} rounds={rounds}")
    for name, ts in times.items():
        print(
            f"{name}: median={statistics.median(ts):.3f}s "
            f"runs={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
