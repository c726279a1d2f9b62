"""Shadow-write + atomic-publish protocol.

Capability twin of the reference's temporary-schema dance
(/root/reference/load_dataset.py:209-252, 365-370): load into
``staging_<dataset>_<epoch>``, and only after everything succeeds move
the results into the target namespace; on any error the staging
namespace is dropped and readers never saw a thing.

Spark mapping (SURVEY.md §2 K3/O1): Spark's catalog cannot move a
table across databases (`ALTER TABLE ... SET SCHEMA` has no
equivalent), so publish = per-table ``INSERT OVERWRITE``-style
``saveAsTable`` from staging into the target. Each table swap is
atomic (new data files written first, catalog pointer flipped last);
cross-*table* atomicity is weaker than the reference's single-schema
swap — documented trade-off, Delta's REPLACE TABLE restores it where
available.

Idempotency (reference O3, tests/test_load_dataset.py:78-84): rerunning
a load is a deterministic overwrite — same inputs, same tables.
"""

from __future__ import annotations

import re
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

STAGING_PREFIX = "staging_"


def staging_db_name(dataset: str, epoch: int | None = None) -> str:
    """``staging_<ds>_<epoch>`` (reference naming: load_dataset.py:69-74)."""
    epoch = int(time.time()) if epoch is None else epoch
    safe = re.sub(r"\W+", "_", dataset)
    return f"{STAGING_PREFIX}{safe}_{epoch}"


def parse_staging_dataset(db: str) -> str | None:
    m = re.fullmatch(rf"{STAGING_PREFIX}(.+)_(\d+)", db)
    return m.group(1) if m else None


class Publisher:
    def __init__(self, spark: SparkSession, target_db: str = "public") -> None:
        self.spark = spark
        self.target_db = target_db

    # -- namespace management (K5) -------------------------------------------

    def _sql(self, stmt: str) -> None:
        self.spark.sql(stmt)

    def list_staging_dbs(self, dataset: str | None = None) -> list[str]:
        """Stale staging namespaces, optionally for one dataset
        (reference: get_temp_schemas, load_dataset.py:82-89)."""
        dbs = [d.name for d in self.spark.catalog.listDatabases()]
        out = []
        for d in dbs:
            ds = parse_staging_dataset(d)
            if ds is not None and (dataset is None or ds == dataset):
                out.append(d)
        return out

    def drop_db(self, db: str) -> None:
        self._sql(f"DROP DATABASE IF EXISTS `{db}` CASCADE")

    @contextmanager
    def staging(self, dataset: str):
        """Create a staging namespace; always drop it on exit — success
        or failure (reference: create_and_enter_temporary_schema,
        load_dataset.py:209-241, rollback at :230-232)."""
        db = staging_db_name(dataset)
        self.drop_db(db)
        self._sql(f"CREATE DATABASE `{db}`")
        try:
            yield db
        finally:
            self.drop_db(db)

    # -- writes ----------------------------------------------------------------

    def write_staging_table(self, db: str, table: str, df: DataFrame) -> None:
        df.write.mode("overwrite").saveAsTable(f"`{db}`.`{table}`")

    def publish_tables(self, staging_db: str, tables: list[str]) -> list[str]:
        """Move results staging → target: drop-and-replace per table
        (reference: drop_tables_if_they_exist + change_table_schemas,
        load_dataset.py:163-169, 244-252)."""
        self._sql(f"CREATE DATABASE IF NOT EXISTS `{self.target_db}`")
        published = []
        for t in tables:
            src = self.spark.table(f"`{staging_db}`.`{t}`")
            src.write.mode("overwrite").saveAsTable(f"`{self.target_db}`.`{t}`")
            published.append(f"{self.target_db}.{t}")
        return published

    # -- whole-protocol convenience ---------------------------------------------

    def load_and_publish(
        self,
        dataset: str,
        builders: dict[str, "callable"],
    ) -> list[str]:
        """Run each ``{table: fn() -> DataFrame}`` into staging, then
        publish all-or-nothing (errors roll back by dropping staging).
        """
        with self.staging(dataset) as db:
            names = []
            for table, build in builders.items():
                self.write_staging_table(db, table, build())
                names.append(table)
            return self.publish_tables(db, names)
