"""Path-sink behaviors: dynamic partition overwrite, clustering that
actually enables file skipping, and small-file compaction."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nycdb_k8s_loader_spark.sinks import (
    clustered_write,
    compact_parquet_dir,
    parquet_file_column_ranges,
    write_partitioned,
)


def test_dynamic_overwrite_touches_only_incoming_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(d, i, "v1") for d in ("a", "b", "c") for i in range(5)],
        "day string, id int, payload string",
    )
    write_partitioned(base, path, ["day"])
    # overwrite ONLY day=b with new payloads
    delta = spark.createDataFrame(
        [("b", i, "v2") for i in range(3)], "day string, id int, payload string"
    )
    write_partitioned(delta, path, ["day"])
    out = spark.read.parquet(path)
    got = {
        (r["day"], r["payload"]) for r in out.select("day", "payload").distinct().collect()
    }
    # a and c keep v1 (untouched), b fully replaced by the 3-row v2 set
    assert got == {("a", "v1"), ("c", "v1"), ("b", "v2")}
    assert out.filter(F.col("day") == "b").count() == 3
    # conf restored: a later plain overwrite is static again
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
    )


def test_clustered_write_yields_disjoint_file_ranges(spark, tmp_path):
    path = str(tmp_path / "clustered")
    df = spark.range(0, 10_000).select(
        (F.col("id") * 37 % 10_000).alias("k"), F.col("id").alias("v")
    )
    clustered_write(df, path, ["k"], num_files=8)
    ranges = [
        (lo, hi)
        for _f, lo, hi in parquet_file_column_ranges(path, "k")
        if lo is not None
    ]
    assert len(ranges) >= 2
    ranges.sort()
    # footer min/max intervals must not overlap: that IS file skipping
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next
    # and the data survived intact
    assert spark.read.parquet(path).count() == 10_000


def test_compact_parquet_dir_reduces_file_count(spark, tmp_path):
    path = str(tmp_path / "many")
    spark.range(0, 2_000).repartition(64).write.parquet(path)
    n_before = sum(
        1
        for root, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    assert n_before == 64
    n_after = compact_parquet_dir(spark, path, target_file_bytes=10**9)
    assert n_after == 1
    assert spark.read.parquet(path).count() == 2_000
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")
