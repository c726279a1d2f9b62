"""Ops CLI tests (O7 — capability twin of the reference's dbtool.py
command surface, tests modeled on tests/test_dbtool.py)."""

from __future__ import annotations

import pytest

from nycdb_k8s_loader_spark import cli
from nycdb_k8s_loader_spark.state.kvstore import DictKVStore


@pytest.fixture()
def kv(monkeypatch):
    store = DictKVStore()
    monkeypatch.setattr(cli, "_default_kv", lambda: store)
    return store


@pytest.fixture()
def cli_db(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS cli_test")
    spark.range(3).write.mode("overwrite").saveAsTable("cli_test.t1")
    spark.range(5).write.mode("overwrite").saveAsTable("cli_test.t2")
    yield "cli_test"
    spark.sql("DROP DATABASE cli_test CASCADE")


def test_rowcounts(spark, cli_db, capsys):
    assert cli.main(["rowcounts", cli_db]) == 0
    out = capsys.readouterr().out
    assert "cli_test.t1\t3" in out and "cli_test.t2\t5" in out


def test_sql_statement(spark, cli_db, capsys):
    assert (
        cli.main(
            ["sql", "SELECT count(*) AS n FROM cli_test.t1"]
        )
        == 0
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0] == "n" and out[1] == "3"


def test_grant_schema_read_records_and_prints(spark, cli_db, kv, capsys):
    from nycdb_k8s_loader_spark.publish.grants import GrantRegistry

    assert cli.main(["grant-schema-read", cli_db, "readonly"]) == 0
    out = capsys.readouterr().out
    assert "GRANT SELECT ON TABLE cli_test.t1 TO readonly;" in out
    assert "GRANT SELECT ON TABLE cli_test.t2 TO readonly;" in out
    # grants persisted as registry metadata (dbtool.py:123-137 analog)
    reg = GrantRegistry(kv)
    [g] = reg.for_table(cli_db, "t1")
    assert g.grantee == "readonly" and g.privileges == ("SELECT",)


def test_lastmod_list_and_reset(kv, capsys):
    kv["etag:https://x/a.csv"] = '"v1"'
    kv["last_modified:https://x/a.csv"] = "Mon, 01 Jan 2024 00:00:00 GMT"
    assert cli.main(["lastmod:list"]) == 0
    assert 'etag:https://x/a.csv\t"v1"' in capsys.readouterr().out
    assert cli.main(["lastmod:reset"]) == 0
    assert "reset https://x/a.csv" in capsys.readouterr().out
    assert "etag:https://x/a.csv" not in kv
