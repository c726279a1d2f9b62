#!/usr/bin/env python
"""A/B: is pre-shuffle map work starved of parallelism by 1-row-group
parquet scans? (guide §1 / §2: measure first, scale-adaptive
partitioning)

Every sf parquet file has ONE row group, so every scan is one task and
all row-local compute before the first exchange (word splits, shingle
hashing, sq_dist folds, WKT parses) runs on ONE core no matter what
SPARK_GRAFT_CPUS says. This times representative operators with the
input as-scanned vs hash-repartitioned to defaultParallelism.

Usage: python tools/ab_scan_spread.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nycdb_k8s_loader_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(label, df, n=3):
    best = []
    for _ in range(n):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best.append(time.perf_counter() - t0)
    print(f"  {label:42s} min={min(best):.3f}s runs={['%.3f' % b for b in best]}")
    return min(best)


def main() -> None:
    spark = get_spark(app_name="ab-scan-spread")
    spark.range(1000).selectExpr("sum(id)").collect()
    par = spark.sparkContext.defaultParallelism

    from pyspark.sql import functions as F

    from nycdb_k8s_loader_spark.operators.dedup import (
        exact_substring_scrub,
        minhash_signatures,
    )
    from nycdb_k8s_loader_spark.operators.similarity import semantic_dedup
    from nycdb_k8s_loader_spark.operators.textops import gopher_quality_rules

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs_sp = docs.repartition(par, "doc_id")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb_sp = emb.repartition(par, "vec_id")

    print(f"defaultParallelism={par}  docs scan partitions="
          f"{docs.rdd.getNumPartitions()}")

    for label, base, spread in [
        ("t13 exact_substring_scrub", docs, docs_sp),
        ("t17 gopher_quality_rules", docs, docs_sp),
    ]:
        print(label)
        timed("as-scanned (1 task)", (
            exact_substring_scrub(base, ngram=8)
            if label.startswith("t13") else gopher_quality_rules(base)))
        timed(f"repartition({par}, key)", (
            exact_substring_scrub(spread, ngram=8)
            if label.startswith("t13") else gopher_quality_rules(spread)))

    print("d03 minhash_signatures")
    timed("as-scanned (1 task)", minhash_signatures(docs, num_hashes=16))
    timed(f"repartition({par}, key)", minhash_signatures(docs_sp, num_hashes=16))

    print("d12 semantic_dedup (build+exec together)")
    t0 = time.perf_counter()
    semantic_dedup(emb, k=8).write.format("noop").mode("overwrite").save()
    print(f"  as-scanned total {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    semantic_dedup(emb_sp, k=8).write.format("noop").mode("overwrite").save()
    print(f"  spread total {time.perf_counter() - t0:.3f}s")
    # repeat to confirm warm
    t0 = time.perf_counter()
    semantic_dedup(emb, k=8).write.format("noop").mode("overwrite").save()
    print(f"  as-scanned total {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    semantic_dedup(emb_sp, k=8).write.format("noop").mode("overwrite").save()
    print(f"  spread total {time.perf_counter() - t0:.3f}s")


if __name__ == "__main__":
    main()
