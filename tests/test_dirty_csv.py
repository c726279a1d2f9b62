"""Dirty-real-data ingestion matrix (r12 verdict #5).

Every other fixture in this suite is synthetic and clean; the
reference's actual inputs are NYC open-data portal CSVs that ship
with BOMs, CRLF line endings, mixed-case headers, short rows,
embedded newlines inside quoted fields, and type junk (reference
analog: the cleaned loading nycdb does for the engine at
/root/reference/load_dataset.py:341-367).  This file feeds each
failure class through the FULL ``Engine.load`` path — landing →
typed scan → staging → validation → publish — and pins the
row-level outcome per ``DatasetDef.csv_options`` policy:

- PERMISSIVE (default): junk parses to NULL, rows survive;
- DROPMALFORMED: rows with unparseable fields vanish from the scan;
- FAILFAST: the load raises and readers keep the last good version;
- the validation gate (``TableDef.checks``) bounds how much
  PERMISSIVE-nulled junk may publish.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from nycdb_k8s_loader_spark.engine import Engine
from nycdb_k8s_loader_spark.publish.validate import TableChecks, ValidationError
from nycdb_k8s_loader_spark.registry import (
    DatasetDef,
    Registry,
    SourceFile,
    TableDef,
)
from nycdb_k8s_loader_spark.state.kvstore import DictKVStore
from nycdb_k8s_loader_spark.state.lastmod import FetchResult

SCHEMA = T.StructType(
    [
        T.StructField("bbl", T.StringType()),
        T.StructField("unitsres", T.IntegerType()),
        T.StructField("borough", T.StringType()),
    ]
)

CLEAN = "bbl,unitsres,borough\n1000010001,10,MN\n2000020002,5,BX\n"


def _engine(spark, tmp_path, content, db, csv_options=None, checks=None):
    """One-dataset engine whose downloader writes ``content``."""
    reg = Registry()
    reg.add(
        DatasetDef(
            name="dirty",
            files=[SourceFile(url="https://x/dirty.csv", dest="dirty.csv")],
            tables=[TableDef("dirty", SCHEMA, checks=checks)],
            csv_options=dict(csv_options or {}),
        )
    )
    state = {"content": content}

    def downloader(url, dest):
        with open(dest, "w", encoding="utf-8") as f:
            f.write(state["content"])

    eng = Engine(
        spark,
        reg,
        DictKVStore(),
        target_db=db,
        landing_root=str(tmp_path / "landing"),
        transport=lambda url, headers: FetchResult(200, etag='"v"'),
        downloader=downloader,
    )
    return eng, state


def _rows(spark, db):
    return {
        (r["bbl"], r["unitsres"], r["borough"])
        for r in spark.table(f"{db}.dirty").collect()
    }


class TestDirtyCsvMatrix:
    def test_bom_crlf_mixed_case_headers(self, spark, tmp_path):
        """BOM + CRLF + MiXeD-case headers — the portal-export
        baseline — must load byte-clean: the header peek strips the
        BOM (utf-8-sig) and lowercases names before binding."""
        content = (
            "﻿BBL,UnitsRes,Borough\r\n"
            "1000010001,10,MN\r\n"
            "2000020002,5,BX\r\n"
        )
        eng, _ = _engine(spark, tmp_path, content, "dirty_bom")
        res = eng.load("dirty")
        assert not res.skipped
        assert _rows(spark, "dirty_bom") == {
            ("1000010001", 10, "MN"),
            ("2000020002", 5, "BX"),
        }

    def test_short_rows_null_trailing_fields_permissive(
        self, spark, tmp_path
    ):
        """A short row (fewer fields than the header) keeps its parsed
        prefix and NULLs the missing tail under the default
        PERMISSIVE policy — the row is not dropped."""
        content = CLEAN + "3000030003,7\n"
        eng, _ = _engine(spark, tmp_path, content, "dirty_short")
        eng.load("dirty")
        assert _rows(spark, "dirty_short") == {
            ("1000010001", 10, "MN"),
            ("2000020002", 5, "BX"),
            ("3000030003", 7, None),
        }

    def test_type_junk_nulls_field_permissive(self, spark, tmp_path):
        """A non-numeric value in an int column NULLs that FIELD; the
        rest of the row survives intact (PERMISSIVE)."""
        content = CLEAN + "4000040004,notanint,QN\n"
        eng, _ = _engine(spark, tmp_path, content, "dirty_junk")
        eng.load("dirty")
        assert _rows(spark, "dirty_junk") == {
            ("1000010001", 10, "MN"),
            ("2000020002", 5, "BX"),
            ("4000040004", None, "QN"),
        }

    def test_embedded_newline_needs_multiline_option(
        self, spark, tmp_path
    ):
        """A quoted field with an embedded newline: the default
        line-splitting scan breaks the record at the physical newline
        (documented wrong — two fragment rows), while
        ``csv_options={"multiLine": "true"}`` parses ONE correct row.
        The knob is per-dataset because multiLine files cannot be
        split for parallel scan — opt in only where the source needs
        it."""
        content = (
            "bbl,unitsres,borough\n"
            '1000010001,10,"M\nN"\n'
            "2000020002,5,BX\n"
        )
        eng, _ = _engine(spark, tmp_path, content, "dirty_nl_default")
        eng.load("dirty")
        rows = _rows(spark, "dirty_nl_default")
        # the record broke at the newline: no row carries the joined
        # field, and the fragment rows are visibly junk
        assert ("1000010001", 10, "M\nN") not in rows
        assert len(rows) == 3  # two fragments + the clean row

        eng2, _ = _engine(
            spark, tmp_path, content, "dirty_nl_multi",
            csv_options={"multiLine": "true"},
        )
        eng2.load("dirty")
        assert _rows(spark, "dirty_nl_multi") == {
            ("1000010001", 10, "M\nN"),
            ("2000020002", 5, "BX"),
        }

    def test_dropmalformed_drops_junk_rows(self, spark, tmp_path):
        """mode=DROPMALFORMED: rows with any unparseable field vanish
        from the scan — the publish carries only clean rows."""
        content = CLEAN + "4000040004,notanint,QN\n3000030003,7\n"
        eng, _ = _engine(
            spark, tmp_path, content, "dirty_drop",
            csv_options={"mode": "DROPMALFORMED"},
        )
        eng.load("dirty")
        assert _rows(spark, "dirty_drop") == {
            ("1000010001", 10, "MN"),
            ("2000020002", 5, "BX"),
        }

    def test_failfast_aborts_and_keeps_last_good_version(
        self, spark, tmp_path
    ):
        """mode=FAILFAST: the first malformed row aborts the load
        inside staging — the exception propagates, the staging
        namespace drops, and readers keep the complete previous
        version."""
        eng, state = _engine(
            spark, tmp_path, CLEAN, "dirty_ff",
            csv_options={"mode": "FAILFAST"},
        )
        eng.load("dirty")
        assert len(_rows(spark, "dirty_ff")) == 2

        state["content"] = CLEAN + "4000040004,notanint,QN\n"
        with pytest.raises(Exception):
            eng.load("dirty", force=True)
        # last good version intact
        assert _rows(spark, "dirty_ff") == {
            ("1000010001", 10, "MN"),
            ("2000020002", 5, "BX"),
        }

    def test_validate_gate_bounds_permissive_junk(self, spark, tmp_path):
        """PERMISSIVE + TableDef.checks: junk parses to NULL in
        staging, the not_null check counts it, and the publish gate
        raises — readers keep the last good version.  This is the
        documented pairing: PERMISSIVE for resilience, checks for a
        bound on how much junk may publish."""
        checks = TableChecks(not_null=["unitsres"], min_rows=1)
        eng, state = _engine(
            spark, tmp_path, CLEAN, "dirty_gate", checks=checks
        )
        eng.load("dirty")
        assert len(_rows(spark, "dirty_gate")) == 2

        state["content"] = CLEAN + "4000040004,notanint,QN\n"
        with pytest.raises(ValidationError):
            eng.load("dirty", force=True)
        assert _rows(spark, "dirty_gate") == {
            ("1000010001", 10, "MN"),
            ("2000020002", 5, "BX"),
        }
