"""GRANT capture/replay across publish (SURVEY.md §2 K10).

The reference snapshots reader GRANTs from Postgres'
``role_table_grants`` before dropping a table and replays them after
the staging→public swap, so readers keep access across a refresh
(/root/reference/lib/db_perms.py:29-57, load_dataset.py:172-200).

OSS Spark's catalog has no ACLs, so the engine's *grant registry* is
the durable source of truth: grants live as metadata in the KV state
store, survive the drop-and-replace publish, and render as the same
``GRANT ... ON TABLE ... TO ...`` statements the reference emits —
applied through a pluggable executor (no-op here; Unity Catalog /
Ranger / Hive SQL in deployments that have one).

The reference's postgres-side subtleties that carry over:
- multiple privileges per grantee collapse to one statement with a
  comma-joined, deterministic privilege list (db_perms.py:36
  ``string_agg(privilege_type, ', ')``);
- ``WITH GRANT OPTION`` is preserved per (table, grantee)
  (db_perms.py:40-44);
- owner self-grants are not recorded (db_perms.py:51
  ``tableowner <> grantee`` — we simply never record an owner).
"""

from __future__ import annotations

import json
from collections.abc import Callable, MutableMapping
from contextlib import contextmanager
from dataclasses import dataclass

_KEY_PREFIX = "grant:"


@dataclass(frozen=True)
class Grant:
    db: str
    table: str
    grantee: str
    privileges: tuple[str, ...]
    grantable: bool = False

    @property
    def sql(self) -> str:
        """The reference's statement shape (db_perms.py:33-45)."""
        privs = ", ".join(sorted(self.privileges))
        opt = " WITH GRANT OPTION" if self.grantable else ""
        return (
            f"GRANT {privs} ON TABLE {self.db}.{self.table} "
            f"TO {self.grantee}{opt};"
        )


class GrantRegistry:
    """Grants as KV metadata: key ``grant:<db>.<table>``, value = JSON
    list of (grantee, privileges, grantable)."""

    def __init__(self, store: MutableMapping) -> None:
        self.store = store

    def _key(self, db: str, table: str) -> str:
        return f"{_KEY_PREFIX}{db}.{table}"

    def add(self, grant: Grant) -> None:
        grants = [g for g in self.for_table(grant.db, grant.table)
                  if g.grantee != grant.grantee]
        grants.append(grant)
        self.store[self._key(grant.db, grant.table)] = json.dumps(
            [
                {
                    "grantee": g.grantee,
                    "privileges": sorted(g.privileges),
                    "grantable": g.grantable,
                }
                for g in sorted(grants, key=lambda g: g.grantee)
            ]
        )

    def for_table(self, db: str, table: str) -> list[Grant]:
        raw = self.store.get(self._key(db, table))
        if not raw:
            return []
        return [
            Grant(
                db=db,
                table=table,
                grantee=d["grantee"],
                privileges=tuple(d["privileges"]),
                grantable=d["grantable"],
            )
            for d in json.loads(raw)
        ]

    def grant_sql(self, db: str, table: str) -> str:
        """Concatenated statements for one table (reference
        ``get_grant_sql`` return shape)."""
        return "".join(g.sql for g in self.for_table(db, table))

    @contextmanager
    def save_and_reapply(
        self,
        db: str,
        tables: list[str],
        executor: Callable[[str], None] | None = None,
    ):
        """Snapshot grants for ``tables``, run the publish inside the
        block, then replay — the reference's
        ``save_and_reapply_permissions`` (load_dataset.py:172-200).
        The registry itself survives the swap (it is metadata, not
        catalog state); ``executor`` receives each statement for
        engines that can apply it."""
        snapshot = {t: self.for_table(db, t) for t in tables}
        yield snapshot
        for t, grants in snapshot.items():
            for g in grants:
                self.add(g)  # re-assert (idempotent)
                if executor is not None:
                    executor(g.sql)
