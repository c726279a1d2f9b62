"""Path-based sinks: layout-aware parquet writing and maintenance.

The publish protocol (publish/protocol.py) owns *catalog* tables; this
module owns *path* outputs — the shapes a 100 TB pipeline needs that
CTAS doesn't give you:

- :func:`write_partitioned` — hive-partitioned parquet with DYNAMIC
  partition overwrite (rewrite only the partitions present in the
  incoming frame, leave the rest untouched — the incremental-load
  contract; static overwrite would truncate the whole table).
- :func:`clustered_write` — range-partition + sort-within-partitions
  on the cluster columns so every output file covers a disjoint key
  range; parquet footer min/max stats then let any reader (Spark,
  DuckDB, Trino) skip files on point/range predicates. The poor-man's
  Z-order for single-dimension clustering.
- :func:`compact_parquet_dir` — small-file compaction: rewrite a
  directory to ~``target_file_bytes`` files. Streaming sinks and
  over-parallel writers leave thousands of KB-sized files; at 100 TB
  the *metadata* (footer reads, file listings) dominates scan cost
  long before the bytes do.
- :func:`parquet_file_column_ranges` — per-file footer (min, max) for
  a column, read via pyarrow without touching row data; the
  verification hook for clustering quality.

Capability parity note: the reference tunes physical layout with
CREATE INDEX after load (/root/reference/sql/wow sql files; SURVEY §2
K7) — partition pruning + file skipping is the Spark-native analog of
those btree indexes.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    dynamic_overwrite: bool = True,
) -> None:
    """Hive-partitioned parquet write. With ``dynamic_overwrite`` only
    the partitions present in ``df`` are replaced (Spark's
    ``partitionOverwriteMode=dynamic``) — the idempotent daily-load
    shape: reprocessing one day rewrites one directory, never the
    table. The conf is set per-write and restored, so a shared session
    isn't left in dynamic mode (which silently changes the semantics
    of every later overwrite)."""
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, "static")
    try:
        spark.conf.set(key, "dynamic" if dynamic_overwrite else "static")
        (
            df.write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
    finally:
        spark.conf.set(key, prev)


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on ``cluster_cols``: range-repartition
    into ``num_files`` disjoint, ordered key ranges, sort within each,
    one file per range. Every file's footer min/max for the cluster
    columns is then a tight, non-overlapping interval — a reader with
    a point or range predicate prunes to O(1) files instead of
    scanning all of them (verified via
    :func:`parquet_file_column_ranges` in tests/test_sinks.py).

    Range boundaries come from Spark's reservoir sample of the input —
    skewed keys get proportional range widths for free, where
    hash-partitioning + sort would leave every file's (min, max) span
    the whole domain."""
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .parquet(path)
    )


def _dir_parquet_files(path: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.join(root, f))
    return sorted(out)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a (non-hive-partitioned) parquet directory into
    ``ceil(total_bytes / target_file_bytes)`` files; returns the new
    file count. Read→repartition→write-to-side-dir→swap, so a reader
    never sees a half-deleted mix of old and new files. The swap is
    two renames on a local/HDFS filesystem, which leaves one narrow
    window: between them the live path does not exist at all (a racing
    open gets ENOENT and should retry), and a crash there leaves the
    data intact under ``<path>._compact_old`` — this function restores
    it on a failed second rename, and an operator can restore it by
    hand after a hard crash. On eventual-rename object stores run
    compaction in the table-maintenance window instead.

    Sizing reads the FILE sizes, not a row count: compaction exists
    precisely when rows-per-file is unrepresentative (thousands of
    tiny streaming commits), and bytes are what the scan planner
    (``spark.sql.files.maxPartitionBytes``) slices by.
    """
    files = _dir_parquet_files(path)
    if not files:
        raise ValueError(f"no parquet files under {path}")
    total = sum(os.path.getsize(f) for f in files)
    n = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except OSError:
        os.rename(old, path)  # restore the live dir, then re-raise
        raise
    import shutil

    shutil.rmtree(old)
    return len(_dir_parquet_files(path))


def parquet_file_column_ranges(
    path: str, column: str
) -> list[tuple[str, object, object]]:
    """(file, min, max) of ``column`` per parquet file under ``path``,
    from footer statistics only — zero row reads. This is exactly the
    metadata a scan planner consults for file skipping, so asserting
    non-overlap here asserts real pruning behavior, not a proxy."""
    import pyarrow.parquet as pq

    out = []
    for f in _dir_parquet_files(path):
        md = pq.ParquetFile(f).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema == column and col.statistics:
                    s = col.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((f, lo, hi))
    return out
