#!/usr/bin/env python
"""Dump the physical plan of ONE star-contraction round (generation
k=1 over g04's sf0.01 edge fixture) before/after the r13 second-pass
rework, for plans/r13/star_round_{before,after}.txt.

'before' = re-canonicalize+distinct after each star step, convergence
as a separate exceptAll job (both plans dumped). 'after' = the repo's
loop body: large_star -> small_star straight through, convergence
join + Observation riding the generation checkpoint (one plan).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nycdb_k8s_loader_spark.operators.graph import (  # noqa: E402
    _iteration_sized_shuffle,
    _large_star,
    _small_star,
    _static_loop_plans,
    _symmetrized,
)
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402
from tools.ab_star_loop import _old_small_star  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r13",
    )
    spark = get_spark(app_name="capture-star-round-plan")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    p = 4 * orders.count()
    ok = F.col("o_orderkey")
    edges = (
        orders.select(
            (ok % p).alias("src"), ((ok * 7 + 3) % p).alias("dst")
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    with _iteration_sized_shuffle(edges, None):
        raw = edges.select(
            F.col("src").alias("u"), F.col("dst").alias("v")
        ).localCheckpoint(eager=True)
        with _static_loop_plans(spark):
            cur = (
                raw.filter(F.col("u") != F.col("v"))
                .select(
                    F.greatest("u", "v").alias("u"),
                    F.least("u", "v").alias("v"),
                )
                .distinct()
                .localCheckpoint(eager=True)
            )

            # ---- before: two identity stages + exceptAll convergence
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
            nxt_old = _old_small_star(dir_edges).select(
                F.greatest("u", "v").alias("u"),
                F.least("u", "v").alias("v"),
            ).distinct()
            nxt_old_ckpt = nxt_old.localCheckpoint(eager=True)
            conv_old = (
                cur.exceptAll(nxt_old_ckpt)
                .unionByName(nxt_old_ckpt.exceptAll(cur))
                .limit(1)
            )
            with open(
                os.path.join(out_dir, "star_round_before.txt"), "w"
            ) as fh:
                fh.write("== generation plan (checkpoint job) ==\n")
                fh.write(nxt_old._sc._jvm.PythonSQLUtils.explainString(
                    nxt_old._jdf.queryExecution(), "formatted"
                ))
                fh.write(
                    "\n== separate per-round convergence job "
                    "(exceptAll x2 + limit + count) ==\n"
                )
                fh.write(conv_old._sc._jvm.PythonSQLUtils.explainString(
                    conv_old._jdf.queryExecution(), "formatted"
                ))

            # ---- after: straight-through steps + convergence join
            # riding the same plan (the Observation's CollectMetrics)
            nxt_new = (
                _small_star(_large_star(_symmetrized(cur, "u", "v")))
                .join(
                    cur.withColumn("__old", F.lit(True)).hint(
                        "shuffle_hash"
                    ),
                    ["u", "v"],
                    "left",
                )
                .select("u", "v")
            )
            with open(
                os.path.join(out_dir, "star_round_after.txt"), "w"
            ) as fh:
                fh.write(
                    "== generation plan (convergence join + counts "
                    "ride this same checkpoint job via Observation) ==\n"
                )
                fh.write(nxt_new._sc._jvm.PythonSQLUtils.explainString(
                    nxt_new._jdf.queryExecution(), "formatted"
                ))
    print("wrote star_round_before.txt / star_round_after.txt")


if __name__ == "__main__":
    main()
