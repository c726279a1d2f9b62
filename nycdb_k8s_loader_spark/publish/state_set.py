"""Atomic multi-table state publish — N state tables, ONE pointer flip.

The c08/c09 incremental-curation funnel keeps FOUR published states
(sentence keys, duplicated grams, dedup signatures, frozen mixture
rates).  A takedown compacts all four; until round 12 each compacted
frame was written to its own fixed path independently, so a probe
racing a takedown could read a compacted signature state next to
stale rates — exactly the torn-read class the reference prevents by
wrapping every per-load SET SCHEMA in one transaction
(reference: load_dataset.py:209-252, all-tables-one-commit).

Spark-side twin: every publish writes ALL tables of the set into ONE
fresh immutable version directory
``<root>/<logical>__v_<epoch>_<seq>/<table>/`` and then performs a
single :class:`~nycdb_k8s_loader_spark.publish.protocol.VersionPointer`
flip (one atomic KV write, temp-file + ``os.replace`` under
``ParquetKVStore``).  Readers resolve the pointer ONCE and read every
table of the set out of that one directory — a reader interleaved
anywhere between per-table writes sees the complete PREVIOUS set,
never a mix (pinned in tests/test_versioned_publish.py).

Scale shape: the publish cost is one parquet write per state table —
linear in state size, zero shuffles beyond what the state frames
themselves carry; the flip is O(1).  Old versions stay on disk for a
reader grace window and are pruned keep-N like version databases.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

from nycdb_k8s_loader_spark.publish.protocol import (
    VersionPointer,
    parse_version_db,
    version_db_name,
)


class StateSetPublisher:
    """Publish a NAMED SET of state tables as one atomic unit.

    ``kv`` is any str→str mapping with ``get_or_none`` (DictKVStore
    for tests, ParquetKVStore for a persisted pointer).  The pointer
    key is ``current_db_version:<logical>`` — the same namespace the
    versioned-database publish uses, so one KV file can carry both.
    """

    def __init__(self, root: str, kv) -> None:
        self.root = root
        self.pointer = VersionPointer(kv)

    # -- write side ----------------------------------------------------

    def publish(
        self,
        logical: str,
        frames: dict[str, DataFrame],
        epoch: int | None = None,
    ) -> str:
        """Write every frame into one fresh version dir, then flip the
        ONE pointer.  Returns the version dir path.

        The flip happens strictly after the LAST table's ``_SUCCESS``
        lands: a failure in any write leaves the pointer untouched
        (readers keep the complete previous set) and the partial
        version dir unreferenced for :meth:`prune` to collect.
        """
        if not frames:
            raise ValueError("state set must contain at least one table")
        epoch = int(time.time()) if epoch is None else epoch
        seq = self._next_seq(logical, epoch)
        vdir = os.path.join(self.root, version_db_name(logical, epoch, seq))
        for name, df in frames.items():
            df.write.mode("errorifexists").parquet(
                os.path.join(vdir, name)
            )
        # THE commit — one atomic KV write covering the whole set
        self.pointer.flip(logical, vdir)
        return vdir

    def _next_seq(self, logical: str, epoch: int) -> int:
        """Monotonic within an epoch second — mirrors the version-db
        naming so two publishes in the same second can't collide."""
        if not os.path.isdir(self.root):
            return 0
        prefix = f"{logical}__v_{epoch}_"
        taken = [
            int(d[len(prefix):])
            for d in os.listdir(self.root)
            if d.startswith(prefix) and d[len(prefix):].isdigit()
        ]
        return max(taken) + 1 if taken else 0

    # -- read side -------------------------------------------------------

    def read(
        self, spark: SparkSession, logical: str
    ) -> dict[str, DataFrame]:
        """Resolve the pointer ONCE, then read every table of the set
        from that single immutable version dir.  Because resolution is
        a single KV read and the dir never mutates, no interleaving
        with a concurrent publish can yield tables from two versions.
        """
        vdir = self.pointer.current(logical)
        if vdir is None:
            raise LookupError(f"state set {logical!r} never published")
        return {
            name: spark.read.parquet(os.path.join(vdir, name))
            for name in sorted(os.listdir(vdir))
            if os.path.isdir(os.path.join(vdir, name))
        }

    def current_version(self, logical: str) -> str | None:
        return self.pointer.current(logical)

    # -- retention -------------------------------------------------------

    def prune(self, logical: str, keep: int = 2) -> list[str]:
        """Drop all but the newest ``keep`` version dirs of
        ``logical``, NEVER the currently-pointed-at one (in-flight
        readers of recent old versions get a grace window by keeping
        keep>=2).  Partial dirs from failed publishes sort oldest and
        age out the same way.  Returns what was removed."""
        if not os.path.isdir(self.root):
            return []
        vdirs = sorted(
            d
            for d in os.listdir(self.root)
            if parse_version_db(d) == logical
        )
        current = self.pointer.current(logical)
        doomed = [
            d
            for d in vdirs[: max(0, len(vdirs) - keep)]
            if current is None
            or os.path.join(self.root, d) != current
        ]
        for d in doomed:
            shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)
        return doomed
