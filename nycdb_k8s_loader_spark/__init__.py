"""nycdb_k8s_loader_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the *capabilities* of
JustFixNYC/nycdb-k8s-loader (reference: /root/reference, read-only):
a dataset-registry-driven batch ingestion engine, a SQL/DataFrame
transformation layer covering every relational construct the
reference's SQL uses (SURVEY.md §2), and an atomic-publish +
incremental-refresh + state-tracking runtime — all on Spark
DataFrame/SQL/Catalyst instead of psycopg2/Postgres.

Layout:
    session.py    SparkSession factory tuned for local + cluster
    registry.py   declarative dataset registry (reference: load_dataset.py:92-118)
    scheduling.py cron schedule registry (reference: scheduling.py:45-100)
    sources/      typed readers: csv/parquet/excel/multi-file union
    operators/    relational + dedup + similarity + text operators
    functions/    scalar function pack (trigram, slugify, …)
    plans/        the query catalog: Spark fn + DuckDB oracle twin
    state/        KV store, lastmod conditional-GET, dataset tracker
    publish/      staging-namespace atomic publish protocol
    streaming/    Structured Streaming incremental ingestion
"""

__version__ = "0.1.0"
