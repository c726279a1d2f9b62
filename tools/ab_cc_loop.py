#!/usr/bin/env python
"""Interleaved A/B for the r13 connected-components loop rework
(fused init + static-plan fence + b-keyed edge dedup) — guide §1:
same session, same JVM, per-variant warmup, N timed rounds each,
variants alternating so machine weather hits both equally.

Variant OLD reconstructs the pre-r13 loop verbatim (sym =
symmetrize→distinct→checkpoint under AQE, identity-label init job,
per-round convergence riding the label checkpoint's Observation).
Variant NEW calls the repo's connected_components. Both consume the
SAME checkpointed edge frame, so the A/B isolates the loop itself
(the upstream LSH chain is paid once, outside the timed region).

Usage: python tools/ab_cc_loop.py [rounds=3]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from nycdb_k8s_loader_spark.operators.dedup import (  # noqa: E402
    _lsh_verified_pairs,
)
from nycdb_k8s_loader_spark.operators.graph import (  # noqa: E402
    _iteration_sized_shuffle,
    _symmetrized,
    connected_components,
    release_local_checkpoint,
)
from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402


def old_connected_components(edges, src="src", dst="dst",
                             max_iterations=20):
    """The pre-r13 loop, verbatim (AQE-on checkpoints, identity-label
    init job, distinct sym keyed on (a, b))."""
    with _iteration_sized_shuffle(edges, None):
        sym = (
            _symmetrized(edges, src, dst)
            .distinct()
            .localCheckpoint(eager=True)
        )
        labels = (
            sym.select(F.col("a").alias("node"))
            .distinct()
            .withColumn("component", F.col("node"))
            .localCheckpoint(eager=True)
        )
        for _ in range(max_iterations):
            neighbor_min = (
                sym.hint("shuffle_hash").join(labels, sym.b == labels.node)
                .groupBy("a")
                .agg(F.min("component").alias("nbr_component"))
            )
            obs = Observation()
            new_labels = (
                labels.join(
                    neighbor_min, labels.node == neighbor_min.a, "left"
                )
                .select(
                    "node",
                    F.least(
                        F.col("component"),
                        F.coalesce(
                            F.col("nbr_component"), F.col("component")
                        ),
                    ).alias("component"),
                    (F.col("nbr_component") < F.col("component")).alias(
                        "__chg"
                    ),
                )
                .observe(
                    obs,
                    F.count(F.when(F.col("__chg"), 1)).alias("n_changed"),
                )
                .select("node", "component")
                .localCheckpoint(eager=True)
            )
            changed = obs.get["n_changed"]
            release_local_checkpoint(labels)
            labels = new_labels
            if changed == 0:
                release_local_checkpoint(sym)
                return labels
    raise RuntimeError("old_connected_components did not converge")


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-cc-loop")
    spark.range(1000).selectExpr("sum(id)").collect()

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
    )
    # d09's real edge plan, materialized ONCE outside the timed region
    edges = _lsh_verified_pairs(
        docs, threshold=0.7, num_hashes=8, bands=4, shingles=3,
        id_col="doc_id", text_col="text",
    ).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    n_edges = edges.count()

    variants = {
        "old_loop": lambda: old_connected_components(edges),
        "new_loop": lambda: connected_components(edges),
    }
    # warmup each variant once (JIT/codegen)
    for fn in variants.values():
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
