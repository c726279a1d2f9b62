"""KV store / lastmod / tracker contract tests (mirrors the
reference's unit pyramid: tests/test_dbhash.py, test_lastmod.py,
test_dataset_tracker.py)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from nycdb_k8s_loader_spark.state.kvstore import DictKVStore, ParquetKVStore
from nycdb_k8s_loader_spark.state.lastmod import (
    FetchResult,
    LastmodInfo,
    UrlModTracker,
)
from nycdb_k8s_loader_spark.state.tracker import DatasetTracker


@pytest.fixture(params=["dict", "parquet"])
def kv(request, tmp_path):
    if request.param == "dict":
        return DictKVStore()
    return ParquetKVStore(str(tmp_path / "kv.parquet"))


class TestKVStore:
    def test_get_set_delete(self, kv):
        kv["a"] = "1"
        assert kv["a"] == "1"
        kv["a"] = "2"
        assert kv["a"] == "2"
        del kv["a"]
        assert kv.get("a") is None

    def test_set_or_delete(self, kv):
        kv.set_or_delete("k", "v")
        assert kv["k"] == "v"
        kv.set_or_delete("k", None)
        assert "k" not in kv
        kv.set_or_delete("never_existed", None)  # no-op, no raise

    def test_non_str_value_rejected(self, kv):
        with pytest.raises(TypeError):
            kv["k"] = 42

    def test_parquet_persistence(self, tmp_path):
        path = str(tmp_path / "kv2.parquet")
        s1 = ParquetKVStore(path)
        s1["x"] = "y"
        s1["z"] = "w"
        del s1["z"]
        s2 = ParquetKVStore(path)
        assert dict(s2) == {"x": "y"}


def make_transport(responses: dict[str, FetchResult]):
    calls: list[tuple[str, dict]] = []

    def transport(url: str, headers: dict[str, str]) -> FetchResult:
        calls.append((url, headers))
        return responses[url]

    transport.calls = calls
    return transport


class TestUrlModTracker:
    URL = "https://example.com/data.csv"

    def test_change_then_304_skip(self):
        kv = DictKVStore()
        t1 = make_transport(
            {self.URL: FetchResult(200, etag='"abc"', last_modified="Mon, 01 Jan")}
        )
        tracker = UrlModTracker([self.URL], kv, t1)
        assert tracker.did_any_urls_change()
        # validators not persisted until after publish
        assert LastmodInfo.read(kv, self.URL) == (None, None)
        tracker.update_lastmods()
        assert LastmodInfo.read(kv, self.URL) == ('"abc"', "Mon, 01 Jan")

        t2 = make_transport({self.URL: FetchResult(304)})
        tracker2 = UrlModTracker([self.URL], kv, t2)
        assert not tracker2.did_any_urls_change()
        # conditional headers were sent from stored state
        _, headers = t2.calls[0]
        assert headers == {
            "If-None-Match": '"abc"',
            "If-Modified-Since": "Mon, 01 Jan",
        }

    def test_error_counts_as_changed(self):
        kv = DictKVStore()
        t = make_transport({self.URL: FetchResult(500)})
        assert UrlModTracker([self.URL], kv, t).did_any_urls_change()

    def test_any_semantics(self):
        kv = DictKVStore()
        urls = ["u1", "u2"]
        t = make_transport({"u1": FetchResult(304), "u2": FetchResult(200)})
        assert UrlModTracker(urls, kv, t).did_any_urls_change()


class TestDatasetTracker:
    def test_update_and_read(self):
        kv = DictKVStore()
        frozen = datetime(2026, 8, 13, 12, 0, 0, tzinfo=timezone.utc)
        tr = DatasetTracker(kv, now=lambda: frozen)
        tr.update_tracker("pluto")
        assert tr.get_last_refresh("pluto") == frozen
        assert tr.get_last_refresh("missing") is None


class TestLastmodGatedExport:
    """The search-index export gate (reference wowutil.py:99-141):
    push iff the source refreshed since the last export — frozen-time
    twins of the reference's date-compare branches."""

    URL = "https://example.com/hpd_registrations.csv"

    def _gate(self, kv, now):
        from nycdb_k8s_loader_spark.state.export_gate import (
            LastmodGatedExport,
        )

        return LastmodGatedExport(
            kv, [self.URL], "landlord_search_index", clock=lambda: now
        )

    def test_no_source_lastmod_skips(self):
        kv = DictKVStore()
        now = datetime(2026, 8, 14, tzinfo=timezone.utc)
        ran = []
        gate = self._gate(kv, now)
        assert not gate.run(lambda: ran.append(1))
        assert ran == [] and gate.exported_at() is None

    def test_first_export_pushes_and_stamps(self):
        kv = DictKVStore()
        LastmodInfo.write(
            kv, self.URL, None, "Mon, 10 Aug 2026 00:00:00 GMT"
        )
        now = datetime(2026, 8, 14, tzinfo=timezone.utc)
        ran = []
        gate = self._gate(kv, now)
        assert gate.run(lambda: ran.append(1))
        assert ran == [1]
        assert gate.exported_at() == now

    def test_stale_source_skips_then_refresh_pushes(self):
        kv = DictKVStore()
        LastmodInfo.write(
            kv, self.URL, None, "Mon, 10 Aug 2026 00:00:00 GMT"
        )
        now = datetime(2026, 8, 14, tzinfo=timezone.utc)
        gate = self._gate(kv, now)
        assert gate.run(lambda: None)  # first export at `now`

        # source unchanged (older than exported_at) → skip
        ran = []
        assert not gate.run(lambda: ran.append(1))
        assert ran == []
        push, reason = gate.should_export()
        assert not push and "no new source data" in reason

        # source refreshes past the export stamp → push again
        LastmodInfo.write(
            kv, self.URL, None, "Sat, 15 Aug 2026 00:00:00 GMT"
        )
        assert gate.run(lambda: ran.append(2))
        assert ran == [2]

    def test_failed_export_does_not_advance_stamp(self):
        kv = DictKVStore()
        LastmodInfo.write(
            kv, self.URL, None, "Mon, 10 Aug 2026 00:00:00 GMT"
        )
        now = datetime(2026, 8, 14, tzinfo=timezone.utc)
        gate = self._gate(kv, now)

        def boom():
            raise RuntimeError("downstream down")

        with pytest.raises(RuntimeError):
            gate.run(boom)
        assert gate.exported_at() is None  # retried next run

    def test_multi_url_takes_newest(self):
        from nycdb_k8s_loader_spark.state.export_gate import (
            LastmodGatedExport,
        )

        kv = DictKVStore()
        LastmodInfo.write(kv, "u1", None, "Mon, 10 Aug 2026 00:00:00 GMT")
        LastmodInfo.write(kv, "u2", None, "Wed, 12 Aug 2026 00:00:00 GMT")
        gate = LastmodGatedExport(
            kv, ["u1", "u2"], "k",
            clock=lambda: datetime(2026, 8, 14, tzinfo=timezone.utc),
        )
        assert gate.source_last_updated() == datetime(
            2026, 8, 12, tzinfo=timezone.utc
        )
