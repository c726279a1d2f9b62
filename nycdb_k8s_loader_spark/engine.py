"""Engine orchestration: the full per-dataset load lifecycle.

Spark re-expression of /root/reference/load_dataset.py:308-381:

    check URLs (conditional GET) ── unchanged? → skip everything
        │ changed
    download to landing dir
        │
    staging namespace:  read typed sources → tables
                        run SQL transforms (search-path resolved)
        │
    atomic publish staging → target namespace
        │
    update lastmod validators + dataset tracker   (only after publish)

Boundary behavior mirrors the reference exactly: 304-everywhere skips
the Spark job entirely (work avoidance, lastmod.py:49-62 +
load_dataset.py:352-357); state is persisted only after a successful
publish so a crashed load retries from scratch; custom datasets
dispatch to registered builders (load_dataset.py:319-338).
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from nycdb_k8s_loader_spark.publish.parse_created_tables import (
    is_function_sql,
    parse_created_tables,
)
from nycdb_k8s_loader_spark.publish.protocol import Publisher
from nycdb_k8s_loader_spark.publish.resolver import SearchPathResolver
from nycdb_k8s_loader_spark.registry import DatasetDef, Registry
from nycdb_k8s_loader_spark.sources.readers import read_csv
from nycdb_k8s_loader_spark.state.lastmod import Transport, UrlModTracker, requests_transport
from nycdb_k8s_loader_spark.state.tracker import DatasetTracker

log = logging.getLogger("nycdb_k8s_loader_spark")


@dataclass
class LoadResult:
    dataset: str
    skipped: bool
    published: list[str] = field(default_factory=list)


class Notifier:
    """Pluggable progress/error notifications (reference: lib/slack.py
    — webhook messages with HTML escaping, errors swallowed so a
    notification failure never fails a load, slack.py:63-76)."""

    def notify(self, message: str) -> None:  # pragma: no cover - iface
        log.info("%s", message)

    def safe_notify(self, message: str) -> None:
        try:
            self.notify(message)
        except Exception:  # noqa: BLE001 - by contract never raise
            log.warning("notifier failed for %r", message, exc_info=True)


class Engine:
    def __init__(
        self,
        spark: SparkSession,
        registry: Registry,
        kv,
        target_db: str = "public",
        landing_root: str = "/tmp/nycdb_landing",
        transport: Transport = requests_transport,
        downloader: Callable[[str, str], None] | None = None,
        notifier: Notifier | None = None,
        search_path: list[str] | None = None,
    ) -> None:
        self.spark = spark
        self.registry = registry
        self.kv = kv
        self.publisher = Publisher(spark, target_db)
        self.landing_root = landing_root
        self.transport = transport
        self.downloader = downloader or self._download
        self.notifier = notifier or Notifier()
        self.tracker = DatasetTracker(kv)
        self.search_path = search_path or [target_db]

    @staticmethod
    def _download(url: str, dest: str) -> None:  # pragma: no cover - network
        import urllib.request

        urllib.request.urlretrieve(url, dest)

    # -- the lifecycle ---------------------------------------------------------

    def load(self, name: str, force: bool = False) -> LoadResult:
        ds = self.registry.get(name)
        self.notifier.safe_notify(f"Loading dataset {name}…")

        modtracker = UrlModTracker(self.registry.urls(name), self.kv, self.transport)
        if ds.files and not force and not modtracker.did_any_urls_change():
            # Reference short-circuit (load_dataset.py:352-357).
            self.notifier.safe_notify(f"{name} is unchanged; skipping load.")
            return LoadResult(dataset=name, skipped=True)

        if ds.builder is not None:
            # Custom-dataset dispatch (load_dataset.py:319-338).
            published = ds.builder(self.spark, self)
        else:
            published = self._standard_load(ds)

        modtracker.update_lastmods()
        self.tracker.update_tracker(name)
        self.notifier.safe_notify(f"Finished loading {name}.")
        return LoadResult(dataset=name, skipped=False, published=published)

    def _standard_load(self, ds: DatasetDef) -> list[str]:
        import os

        with self.publisher.staging(ds.name) as staging_db:
            # 1. ingest typed source tables
            for table in ds.tables:
                if table.schema is None:
                    continue  # derived table, produced by SQL below
                paths = [
                    os.path.join(self.landing_root, ds.name, f.dest)
                    for f in ds.files
                ]
                existing = [p for p in paths if os.path.exists(p)]
                missing = [
                    (f.url, os.path.join(self.landing_root, ds.name, f.dest))
                    for f in ds.files
                    if not os.path.exists(
                        os.path.join(self.landing_root, ds.name, f.dest)
                    )
                ]
                for url, dest in missing:
                    os.makedirs(os.path.dirname(dest), exist_ok=True)
                    self.downloader(url, dest)
                    existing.append(dest)
                df = read_csv(self.spark, existing, table.schema)
                self.publisher.write_staging_table(staging_db, table.name, df)

            # 2. SQL transformation scripts, staging-first resolution
            resolver = SearchPathResolver(
                self.spark, [staging_db, *self.search_path]
            )
            created: list[str] = [
                t.name for t in ds.tables if t.schema is not None
            ]
            prev_db = self.spark.catalog.currentDatabase()
            self.spark.catalog.setCurrentDatabase(staging_db)
            try:
                for script in ds.sql:
                    with open(script, encoding="utf-8") as fh:
                        sql_text = fh.read()
                    if is_function_sql(sql_text):
                        # function re-registration handled post-publish
                        # (reference: load_dataset.py:372-376) — engine
                        # keeps a session-level function registry.
                        continue
                    for stmt in split_statements(sql_text):
                        resolver.sql(stmt)
                    for t in parse_created_tables(sql_text):
                        if t not in created:
                            created.append(t)
            finally:
                self.spark.catalog.setCurrentDatabase(prev_db)

            # 3. atomic publish
            return self.publisher.publish_tables(staging_db, created)

    def load_all(self, targets: list[str] | None = None) -> list[LoadResult]:
        """Dependency-ordered multi-dataset load (reference O4)."""
        return [self.load(n) for n in self.registry.topo_order(targets)]


def split_statements(sql_text: str) -> list[str]:
    """Split a script into statements on top-level semicolons
    (string-literal- and comment-aware; the reference executes whole
    files per cursor so Postgres splits for it — Spark needs one
    statement per ``spark.sql`` call)."""
    out: list[str] = []
    buf: list[str] = []
    in_str: str | None = None
    i, n = 0, len(sql_text)
    while i < n:
        ch = sql_text[i]
        nxt = sql_text[i + 1] if i + 1 < n else ""
        if in_str:
            buf.append(ch)
            if ch == in_str:
                if in_str == "'" and nxt == "'":
                    buf.append(nxt)
                    i += 1
                else:
                    in_str = None
        elif ch == "-" and nxt == "-":
            while i < n and sql_text[i] != "\n":
                i += 1
            buf.append("\n")
        elif ch == "/" and nxt == "*":
            i += 2
            while i + 1 < n and not (sql_text[i] == "*" and sql_text[i + 1] == "/"):
                i += 1
            i += 1
        elif ch in ("'", '"'):
            in_str = ch
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                out.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        out.append(tail)
    return out
