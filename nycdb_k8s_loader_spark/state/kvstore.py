"""Key-value state store (the reference's ``dbhash`` capability).

The reference keeps a ``(key text PRIMARY KEY, value text)`` table in
Postgres with get/set/delete/set-or-delete upsert semantics
(/root/reference/lib/dbhash.py:51-103) and swaps backends for tests
(dict, sqlite — tests/test_dbhash.py:6-64). We mirror the contract
with two backends:

- :class:`DictKVStore` — in-memory, for tests and dry-runs.
- :class:`ParquetKVStore` — a single tiny parquet file rewritten
  atomically (write temp file + os.replace). State is driver-side
  metadata (a few hundred URL etags), so a distributed table would be
  pure overhead; the atomic-rename matches the reference's
  transactional UPDATE-or-INSERT (dbhash.py:81-91).
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager
from collections.abc import Iterator, MutableMapping

import pyarrow as pa
import pyarrow.parquet as pq

_SCHEMA = pa.schema([("key", pa.string()), ("value", pa.string())])


class DictKVStore(MutableMapping):
    """In-memory backend (reference: DictDbHash, lib/dbhash.py:14-48)."""

    def __init__(self, initial: dict[str, str] | None = None) -> None:
        self._d: dict[str, str] = dict(initial or {})

    def __getitem__(self, key: str) -> str:
        return self._d[key]

    def __setitem__(self, key: str, value: str) -> None:
        if not isinstance(value, str):
            raise TypeError(f"value for {key!r} must be str, got {type(value)}")
        self._d[key] = value

    def __delitem__(self, key: str) -> None:
        del self._d[key]

    def __iter__(self) -> Iterator[str]:
        return iter(self._d)

    def __len__(self) -> int:
        return len(self._d)

    def get_or_none(self, key: str) -> str | None:
        return self._d.get(key)

    def set_or_delete(self, key: str, value: str | None) -> None:
        """None deletes the key (reference: dbhash.py:28-32).

        Routes through __setitem__/__delitem__ so write-through
        backends flush.
        """
        if value is None:
            if key in self._d:
                del self[key]
        else:
            self[key] = value


class ParquetKVStore(DictKVStore):
    """Parquet-backed store with atomic rewrite-on-mutation.

    Load-on-open, write-through on every mutation: each mutation
    rewrites the file to a temp path and ``os.replace``s it into
    place, so readers never observe a torn write — the same
    crash-safety the reference gets from Postgres transactions.
    """

    def __init__(self, path: str) -> None:
        self.path = path
        initial: dict[str, str] = {}
        if os.path.exists(path):
            table = pq.read_table(path)
            initial = dict(
                zip(
                    table.column("key").to_pylist(),
                    table.column("value").to_pylist(),
                )
            )
        super().__init__(initial)

    def _flush(self) -> None:
        table = pa.Table.from_pydict(
            {
                "key": list(self._d.keys()),
                "value": list(self._d.values()),
            },
            schema=_SCHEMA,
        )
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(self.path) or ".", suffix=".parquet.tmp"
        )
        os.close(fd)
        try:
            pq.write_table(table, tmp)
            os.replace(tmp, self.path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def __setitem__(self, key: str, value: str) -> None:
        super().__setitem__(key, value)
        if not self._suspended:
            self._flush()

    def __delitem__(self, key: str) -> None:
        super().__delitem__(key)
        if not self._suspended:
            self._flush()

    _suspended = False

    @contextmanager
    def batch(self):
        """Suspend write-through inside the block, flush once at exit.
        Without this, N key mutations (e.g. validator updates after a
        big load) rewrite the whole file N times — O(N²) bytes."""
        self._suspended = True
        try:
            yield self
        finally:
            self._suspended = False
            self._flush()
