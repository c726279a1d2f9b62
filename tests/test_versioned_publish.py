"""Cross-table atomic publish (versioned database + ONE pointer flip).

The reference swaps ALL of a dataset's tables inside one transaction —
every ``ALTER TABLE ... SET SCHEMA`` in load_dataset.py:244-252 shares
a single ``conn.commit()`` — so a reader never sees table A from the
new load next to table B from the old one. The per-table copy/external
modes cannot give that (round-5/6 verdict "What's missing #1"); the
versioned mode restores it: all tables land in a fresh
``<target>__v_<epoch>_<seq>`` database and the commit is one atomic
KV-pointer write that readers resolve through.
"""

from __future__ import annotations

import pytest

from nycdb_k8s_loader_spark.publish.protocol import (
    Publisher,
    VersionPointer,
    parse_version_db,
    version_db_name,
)
from nycdb_k8s_loader_spark.publish.resolver import SearchPathResolver
from nycdb_k8s_loader_spark.state.kvstore import DictKVStore, ParquetKVStore


def _stage(pub, db, table, value):
    spark = pub.spark
    df = spark.createDataFrame([(value,)], f"{table}_val int")
    pub.write_staging_table(db, table, df)


def _read_val(spark, pointer, logical_db, table):
    phys = pointer.resolve(logical_db)
    return spark.table(f"`{phys}`.`{table}`").collect()[0][0]


class TestVersionDbNames:
    def test_roundtrip_and_ordering(self):
        a = version_db_name("public", 100, 1)
        b = version_db_name("public", 100, 2)
        c = version_db_name("public", 200, 0)
        assert parse_version_db(a) == "public"
        assert parse_version_db("public") is None
        assert parse_version_db("staging_foo_123") is None
        assert sorted([c, a, b]) == [a, b, c]  # lexical == temporal


class TestPointer:
    def test_resolve_falls_back_to_logical(self):
        p = VersionPointer(DictKVStore())
        assert p.resolve("public") == "public"
        p.flip("public", "public__v_1_000001")
        assert p.resolve("public") == "public__v_1_000001"

    def test_parquet_backed_flip_is_atomic_rewrite(self, tmp_path):
        path = str(tmp_path / "ptr.parquet")
        p = VersionPointer(ParquetKVStore(path))
        p.flip("db", "db__v_1_000001")
        # a fresh reader (new process in production) sees the flip
        assert VersionPointer(ParquetKVStore(path)).resolve("db") == (
            "db__v_1_000001"
        )


class TestCrossTableAtomicity:
    """THE brief's 'done' bar: a reader interleaved between table
    publishes sees all-old or all-new, never a mix."""

    def test_interleaved_reader_never_sees_a_mix(self, spark):
        pointer = VersionPointer(DictKVStore())
        pub = Publisher(spark, target_db="vatomic", version_pointer=pointer)
        try:
            # version 1: tables a and b at value 1
            with pub.staging("ds") as db:
                _stage(pub, db, "ta", 1)
                _stage(pub, db, "tb", 1)
                pub.publish_tables(db, ["ta", "tb"])
            assert _read_val(spark, pointer, "vatomic", "ta") == 1
            assert _read_val(spark, pointer, "vatomic", "tb") == 1

            # version 2: interleave a reader after EACH table lands
            seen: list[tuple[int, int]] = []

            def reader(_table):
                seen.append((
                    _read_val(spark, pointer, "vatomic", "ta"),
                    _read_val(spark, pointer, "vatomic", "tb"),
                ))

            with pub.staging("ds") as db:
                _stage(pub, db, "ta", 2)
                _stage(pub, db, "tb", 2)
                pub.publish_tables(
                    db, ["ta", "tb"], on_table_published=reader
                )
            # mid-publish reads: ALL-old both times (the new version db
            # exists but the pointer hasn't flipped)
            assert seen == [(1, 1), (1, 1)]
            # post-commit: ALL-new
            assert _read_val(spark, pointer, "vatomic", "ta") == 2
            assert _read_val(spark, pointer, "vatomic", "tb") == 2
        finally:
            for d in spark.catalog.listDatabases():
                if d.name.startswith("vatomic"):
                    spark.sql(f"DROP DATABASE IF EXISTS `{d.name}` CASCADE")

    def test_failed_publish_never_flips(self, spark):
        pointer = VersionPointer(DictKVStore())
        pub = Publisher(spark, target_db="vabort", version_pointer=pointer)
        try:
            with pub.staging("ds") as db:
                _stage(pub, db, "ta", 1)
                pub.publish_tables(db, ["ta"])
            v1 = pointer.current("vabort")
            with pub.staging("ds") as db:
                _stage(pub, db, "ta", 2)
                with pytest.raises(Exception):
                    # tb was never staged: the publish dies mid-version
                    pub.publish_tables(db, ["ta", "tb"])
            # pointer untouched, readers still on v1, and the aborted
            # version database was dropped
            assert pointer.current("vabort") == v1
            assert _read_val(spark, pointer, "vabort", "ta") == 1
            leftovers = [
                d.name for d in spark.catalog.listDatabases()
                if parse_version_db(d.name) == "vabort" and d.name != v1
            ]
            assert leftovers == []
        finally:
            for d in spark.catalog.listDatabases():
                if d.name.startswith("vabort"):
                    spark.sql(f"DROP DATABASE IF EXISTS `{d.name}` CASCADE")

    def test_old_versions_pruned_never_live(self, spark):
        pointer = VersionPointer(DictKVStore())
        pub = Publisher(
            spark, target_db="vprune",
            version_pointer=pointer, keep_versions=2,
        )
        try:
            for v in (1, 2, 3, 4):
                with pub.staging("ds") as db:
                    _stage(pub, db, "ta", v)
                    pub.publish_tables(db, ["ta"])
            live = pointer.current("vprune")
            versions = [
                d.name for d in spark.catalog.listDatabases()
                if parse_version_db(d.name) == "vprune"
            ]
            assert len(versions) == 2  # keep_versions
            assert live in versions
            assert _read_val(spark, pointer, "vprune", "ta") == 4
        finally:
            for d in spark.catalog.listDatabases():
                if d.name.startswith("vprune"):
                    spark.sql(f"DROP DATABASE IF EXISTS `{d.name}` CASCADE")


class TestResolverHonorsPointer:
    def test_search_path_resolves_to_pointed_version(self, spark):
        pointer = VersionPointer(DictKVStore())
        pub = Publisher(spark, target_db="vres", version_pointer=pointer)
        try:
            with pub.staging("ds") as db:
                _stage(pub, db, "widgets", 7)
                pub.publish_tables(db, ["widgets"])
            r = SearchPathResolver(spark, ["vres"], pointer=pointer)
            out = r.sql("SELECT widgets_val FROM widgets").collect()
            assert out[0][0] == 7
            phys = pointer.current("vres")
            assert f"`{phys}`.`widgets`" in r.rewrite(
                "SELECT widgets_val FROM widgets"
            )
        finally:
            for d in spark.catalog.listDatabases():
                if d.name.startswith("vres"):
                    spark.sql(f"DROP DATABASE IF EXISTS `{d.name}` CASCADE")

    def test_no_pointer_is_unchanged_behavior(self, spark):
        # regression guard: default resolvers (pointer=None) behave
        # exactly as before
        r = SearchPathResolver(spark, ["no_such_db_xyz"])
        assert r.rewrite("SELECT * FROM t") == "SELECT * FROM t"
