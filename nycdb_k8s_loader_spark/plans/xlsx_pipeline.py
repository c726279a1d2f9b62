"""w02: an Excel-sourced dataset end-to-end as a driver-verifiable query.

The reference's only non-CSV ingestion path loads the DOF annual-sales
workbooks through xlrd (/root/reference/load_dataset.py:280-303, one
table fed by several yearly borough files). w02 drives the Spark twin
through the REAL engine path: synthesize two .xlsx workbooks
deterministically from the orders parquet (stdlib zip+XML writer —
this container has no excel engine to build fixtures either), run
``Engine.load("dof_annual_sales")`` (conditional-GET gate → download →
stdlib xlsx parse → typed cast → staging → atomic publish), and return
the published table. The DuckDB oracle replays the derivation in pure
SQL over the same parquet — so a silent break anywhere in the xlsx
parse/cast/union/publish chain hash-fails the driver compare.

Workbook scale note: the reference's workbooks are config-scale (a few
thousand rows each); the fixture keeps that honest by sampling orders
(o_orderkey % 97 == 0 → ~1.5k rows at sf0.1). Driver-side workbook
generation is therefore bounded and cached by parquet mtime, like
w01's CSV fixtures; the ENGINE work (scan → cast → publish) is the
distributed part under test.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nycdb_k8s_loader_spark.plans.catalog import register

#: sampling modulus: keeps workbooks config-scale at every sf
_MOD = 97
#: files split by sale year, like the reference's yearly workbooks
_SPLIT_YEAR = 1995


def _derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic orders → annual-sales derivation."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    c = F.col("o_custkey")
    return o.filter(k % _MOD == 0).select(
        F.col("o_orderpriority").alias("borough"),
        F.concat(F.lit("N"), (c % 10).cast("string")).alias("neighborhood"),
        F.col("o_orderstatus").alias("buildingclasscategory"),
        F.concat(F.lit("A"), k.cast("string")).alias("address"),
        F.concat(F.lit("1"), (c % 100).cast("string")).alias("zipcode"),
        (c % 5).cast("int").alias("residentialunits"),
        (c % 7).cast("int").alias("totalunits"),
        F.col("o_totalprice").alias("saleprice"),
        F.col("o_orderdate").alias("saledate"),
        F.concat(F.lit("BBL"), c.cast("string")).alias("bbl"),
    )


def _workbook_rows(df: DataFrame) -> list[list[str]]:
    from nycdb_k8s_loader_spark.plans.fixture_cache import (
        collect_fixture_pdf,
    )

    pdf = collect_fixture_pdf(df)
    return [list(map(str, r)) for r in pdf.itertuples(index=False)]


def _xlsx_bytes(header: list[str], rows: list[list[str]]) -> bytes:
    """Minimal inline-string workbook (mirrors tests/fixture_gen.py —
    duplicated here because plans must not import from tests/)."""
    import io
    import zipfile

    def col_letter(idx: int) -> str:
        out = ""
        idx += 1
        while idx:
            idx, rem = divmod(idx - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    def row_xml(r: int, vals: list[str]) -> str:
        cells = "".join(
            f'<c r="{col_letter(i)}{r}" t="inlineStr"><is><t>{v}</t></is></c>'
            for i, v in enumerate(vals)
        )
        return f'<row r="{r}">{cells}</row>'

    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        + row_xml(1, header)
        + "".join(row_xml(i + 2, r) for i, r in enumerate(rows))
        + "</sheetData></worksheet>"
    )
    parts = {
        "[Content_Types].xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
            "</Types>"
        ),
        "_rels/.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>"
        ),
        "xl/workbook.xml": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
        ),
        "xl/_rels/workbook.xml.rels": (
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>"
        ),
        "xl/worksheets/sheet1.xml": sheet,
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, content in parts.items():
            zf.writestr(name, content)
    return buf.getvalue()


def _materialize(spark: SparkSession, sf_dir: str) -> str:
    out_dir = "/tmp/dof_xlsx_" + re.sub(r"\W+", "_", sf_dir).strip("_")
    os.makedirs(out_dir, exist_ok=True)
    src = f"{sf_dir}/orders.parquet"
    sig = f"{os.path.getmtime(src)}:{os.path.getsize(src)}"
    marker = os.path.join(out_dir, "_SOURCES")
    names = {
        "dof_annual_sales_2020_manhattan.xlsx": F.year("saledate")
        > _SPLIT_YEAR,
        "dof_annual_sales_2015_manhattan.xlsx": F.year("saledate")
        <= _SPLIT_YEAR,
    }
    if os.path.exists(marker) and open(marker).read() == sig and all(
        os.path.exists(os.path.join(out_dir, n)) for n in names
    ):
        return out_dir
    df = _derived(spark, sf_dir)
    header = [f.name for f in df.schema.fields]
    for fname, cond in names.items():
        rows = _workbook_rows(df.filter(cond))
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(_xlsx_bytes(header, rows))
    with open(marker, "w") as f:
        f.write(sig)
    return out_dir


_W02_ORACLE = f"""
SELECT o_orderpriority AS borough,
       'N' || (o_custkey % 10) AS neighborhood,
       o_orderstatus AS buildingclasscategory,
       'A' || o_orderkey AS address,
       '1' || (o_custkey % 100) AS zipcode,
       (o_custkey % 5)::INT AS residentialunits,
       (o_custkey % 7)::INT AS totalunits,
       o_totalprice AS saleprice,
       o_orderdate AS saledate,
       'BBL' || o_custkey AS bbl
FROM orders
WHERE o_orderkey % {_MOD} = 0
"""


@register(
    "w02_dof_annual_sales_e2e",
    _W02_ORACLE,
    doc="Excel ingestion end-to-end (reference load_dataset.py:"
        "280-303): two synthesized yearly .xlsx workbooks → "
        "Engine.load('dof_annual_sales') — conditional-GET gate, "
        "stdlib zip+XML parse (sources/xlsx.py), per-file typed cast, "
        "multi-workbook unionByName, staging, atomic publish — "
        "returning the published table. Oracle replays the derivation "
        "in SQL over orders, so the whole parse→cast→union→publish "
        "chain is value-hash-checked by the driver (the CORRECTNESS "
        "row the round-3 verdict asked for on top of the pytest e2e).",
    tags=("e2e", "excel", "engine"),
)
def w02(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nycdb_k8s_loader_spark.datasets import wow_registry
    from nycdb_k8s_loader_spark.engine import Engine
    from nycdb_k8s_loader_spark.state.kvstore import DictKVStore
    from nycdb_k8s_loader_spark.state.lastmod import FetchResult

    src_dir = _materialize(spark, sf_dir)

    def downloader(url: str, dest: str) -> None:
        with open(os.path.join(src_dir, os.path.basename(dest)), "rb") as f:
            payload = f.read()
        with open(dest, "wb") as g:
            g.write(payload)

    eng = Engine(
        spark,
        wow_registry(),
        DictKVStore(),
        target_db="dof_src",
        landing_root=os.path.join(src_dir, "landing"),
        transport=lambda url, headers: FetchResult(200, etag='"w02"'),
        downloader=downloader,
    )
    eng.load("dof_annual_sales")
    return spark.table("dof_src.dof_annual_sales")
