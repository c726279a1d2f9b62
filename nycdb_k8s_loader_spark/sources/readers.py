"""Typed source readers (SURVEY.md §2.1 S4/S5/S7/S8).

The reference bulk-loads CSVs through Postgres COPY with DDL from the
dataset registry (/root/reference/load_dataset.py:367 via nycdb
``db_import``) and Excel workbooks through xlrd
(load_dataset.py:280-303). Spark-first mapping:

- CSV: ``spark.read.schema(...).csv`` — explicit StructType always
  (``inferSchema`` double-scans the data and guesses; prod schemas
  come from the registry, SURVEY.md §1.3).
- Multi-file: one reader call with a path list — implicit UNION ALL
  at scan time, parallel across files (this is where Spark beats the
  reference's single-threaded COPY).
- Excel: no core Spark reader — pandas.read_excel → createDataFrame
  (files are small, driver-side is fine); gated behind import-try
  because the excel engines aren't in this container.
- S3: same CSV reader against ``s3a://`` paths when hadoop-aws is on
  the classpath; otherwise a boto3 download to a landing dir. Landing
  paths abstract this away.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: T.StructType,
    header: bool = True,
    **options,
) -> DataFrame:
    """Typed CSV scan; a list of paths is a parallel UNION ALL (S4/S8)."""
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", options.pop("mode", "PERMISSIVE"))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(paths)


def read_csv_union_by_name(
    spark: SparkSession,
    paths: list[str],
    schema: T.StructType,
    header: bool = True,
    **options,
) -> DataFrame:
    """Column-name-based union for file batches whose column order may
    drift between vintages (safer than positional union for yearly
    dataset revisions).

    Each file is read with header-derived column names (NOT the
    registry schema — Spark applies an explicit schema positionally
    and ignores the header, which would silently misbind drifted
    columns), then cast/selected by NAME into the registry schema and
    unioned. A header missing a schema column surfaces as nulls via
    allowMissingColumns; an order change is harmless by construction.
    """
    from pyspark.sql import functions as F

    frames = []
    for p in paths:
        reader = spark.read.option("header", str(header).lower())
        for k, v in options.items():
            reader = reader.option(k, v)
        raw = reader.csv(p)  # header names, all strings
        frames.append(
            raw.select(
                *[
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                    if f.name in raw.columns
                ]
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    # normalize to the full registry schema (missing columns → null)
    return out.select(
        *[
            F.col(f.name).cast(f.dataType)
            if f.name in out.columns
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )


def read_excel(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    sheet_name: int | str = 0,
    skip_rows: int = 0,
) -> DataFrame:
    """Excel scan via pandas (S5; reference loads .xls with xlrd,
    load_dataset.py:280-303). Driver-side by design: these workbooks
    are small config-scale files, not data-scale.
    """
    try:
        import pandas as pd
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("pandas required for excel ingestion") from e
    try:
        pdf = pd.read_excel(path, sheet_name=sheet_name, skiprows=skip_rows)
    except ImportError as e:
        raise NotImplementedError(
            "no excel engine (openpyxl/xlrd) in this environment; "
            "convert to CSV upstream or install an engine"
        ) from e
    if len(pdf.columns) != len(schema.fields):
        raise ValueError(
            f"{path}: sheet has {len(pdf.columns)} columns but the "
            f"registry schema declares {len(schema.fields)} — schema "
            "drift; update the registry or fix the workbook"
        )
    pdf.columns = [f.name for f in schema.fields]
    return spark.createDataFrame(pdf, schema=schema)


def landing_path(root: str, dataset: str, dest: str) -> str:
    """Local/object-store landing location for a downloaded source file
    (reference stages into /var/nycdb, load_dataset.py:29)."""
    return f"{root.rstrip('/')}/{dataset}/{dest}"
