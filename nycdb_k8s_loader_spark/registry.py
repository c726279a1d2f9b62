"""Declarative dataset registry.

Capability twin of the nycdb dataset registry the reference consumes
(/root/reference/load_dataset.py:92-118: ``datasets()[name]`` →
``files`` (url/dest), ``schema`` (table list), ``sql`` (script list))
plus the dependency ordering its derived pipelines assert
(tests/test_wowutil.py:9-11, tests/test_signatureutil.py:34-57).

A dataset entry drives the whole load: source files → typed tables →
SQL transformation scripts → publish. Custom datasets (the reference's
wow/oca/signature/good_cause bypass, load_dataset.py:319-338) register
a builder callable instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import types as T


@dataclass
class SourceFile:
    url: str
    dest: str
    format: str = "csv"  # csv | excel | shapefile | parquet | json


@dataclass
class TableDef:
    name: str
    schema: T.StructType | None = None  # None → derived (CTAS) table
    #: dest names (SourceFile.dest) feeding this table; None → every
    #: dataset file (the single-table common case). Multi-table
    #: datasets MUST map files to tables or rows would cross-load.
    files: list[str] | None = None
    #: publish gate (publish/validate.TableChecks): the STAGING copy
    #: must pass every check or the load raises before any swap —
    #: readers keep the last good version (beyond-reference: the
    #: reference publishes whatever the load produced).
    checks: object | None = None


@dataclass
class DatasetDef:
    name: str
    files: list[SourceFile] = field(default_factory=list)
    tables: list[TableDef] = field(default_factory=list)
    sql: list[str] = field(default_factory=list)  # ordered script paths
    depends_on: list[str] = field(default_factory=list)
    schedule: str | None = None  # key into scheduling.SCHEDULES
    builder: Callable | None = None  # custom dataset escape hatch
    #: per-dataset CSV parse policy, merged into every CSV scan this
    #: dataset's tables make (r12 verdict #5 — real NYC open-data
    #: files carry BOMs, embedded newlines, short rows, type junk).
    #: Keys are Spark DataFrameReader CSV options; the load-bearing
    #: ones:
    #:
    #: - ``mode``: ``PERMISSIVE`` (default — junk fields parse to
    #:   NULL, the row survives; pair with ``TableDef.checks``
    #:   not_null/min_rows to gate how much junk may publish),
    #:   ``DROPMALFORMED`` (rows with any unparseable field are
    #:   dropped from the scan), or ``FAILFAST`` (first malformed
    #:   row aborts the load — staging drops, readers keep the last
    #:   good version).
    #: - ``multiLine``: ``"true"`` for sources with embedded
    #:   newlines inside quoted fields (costs file-at-a-time
    #:   parallelism on that scan — a multiLine file cannot be
    #:   split; keep such sources in many smaller files at scale).
    #:
    #: Behavior per failure class is pinned by
    #: tests/test_dirty_csv.py.
    csv_options: dict = field(default_factory=dict)


class Registry:
    def __init__(self) -> None:
        self._datasets: dict[str, DatasetDef] = {}

    def add(self, ds: DatasetDef) -> DatasetDef:
        if ds.name in self._datasets:
            raise ValueError(f"duplicate dataset {ds.name!r}")
        self._datasets[ds.name] = ds
        return ds

    def get(self, name: str) -> DatasetDef:
        return self._datasets[name]

    def __contains__(self, name: str) -> bool:
        return name in self._datasets

    def names(self) -> list[str]:
        return list(self._datasets)

    def urls(self, name: str) -> list[str]:
        return [f.url for f in self.get(name).files]

    def tables_for(self, name: str) -> list[str]:
        """Table names a dataset produces (reference:
        get_tables_for_dataset, load_dataset.py:108-112)."""
        return [t.name for t in self.get(name).tables]

    def topo_order(self, targets: list[str] | None = None) -> list[str]:
        """Dependency-respecting load order (reference O4: wow depends
        on nycdb datasets + oca; signature on 22 datasets; gce on wow).
        Deterministic: dependencies first, insertion order otherwise.
        """
        targets = targets if targets is not None else self.names()
        out: list[str] = []
        seen: set[str] = set()
        visiting: set[str] = set()

        def visit(n: str) -> None:
            if n in seen:
                return
            if n in visiting:
                raise ValueError(f"dependency cycle through {n!r}")
            visiting.add(n)
            for dep in self.get(n).depends_on:
                visit(dep)
            visiting.discard(n)
            seen.add(n)
            out.append(n)

        for t in targets:
            visit(t)
        return out

    def topo_levels(self, targets: list[str] | None = None) -> list[list[str]]:
        """Group :meth:`topo_order` into dependency levels: every
        dataset in level i depends only on datasets in levels < i, so
        a level's members are safe to load concurrently (the engine's
        parallel ``load_all``). Within a level, topo_order's
        deterministic ordering is preserved."""
        order = self.topo_order(targets)
        depth: dict[str, int] = {}
        for n in order:
            deps = self.get(n).depends_on
            depth[n] = 1 + max((depth[d] for d in deps), default=-1)
        levels: list[list[str]] = [[] for _ in range(max(depth.values()) + 1)] if depth else []
        for n in order:
            levels[depth[n]].append(n)
        return levels
