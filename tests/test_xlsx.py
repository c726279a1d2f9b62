"""Excel ingestion tests (S5) — the path the container could never
execute before: a minimal .xlsx fixture is BUILT with stdlib zipfile
(no excel engine exists here to write one either), then read back
through sources/xlsx.py and the read_excel → typed-DataFrame seam."""

from __future__ import annotations

import zipfile

import pytest
from pyspark.sql import types as T

from nycdb_k8s_loader_spark.sources.readers import read_excel
from nycdb_k8s_loader_spark.sources.xlsx import read_xlsx_rows

_WB_XML = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
  <sheets>
    <sheet name="{name}" sheetId="1" r:id="rId1"/>
  </sheets>
</workbook>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1"
    Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet"
    Target="worksheets/sheet1.xml"/>
</Relationships>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
  <Relationship Id="rId1"
    Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"
    Target="xl/workbook.xml"/>
</Relationships>"""

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
  <Default Extension="rels"
    ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
  <Default Extension="xml" ContentType="application/xml"/>
  <Override PartName="/xl/workbook.xml"
    ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
  <Override PartName="/xl/worksheets/sheet1.xml"
    ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
  <Override PartName="/xl/sharedStrings.xml"
    ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""


def write_fixture_xlsx(path: str, sheet_name: str = "Sheet1") -> None:
    """DOF-annual-sales-ish workbook: header row of shared strings,
    mixed cell types, a gap cell (C3 missing), an inline string, a
    boolean, and a float."""
    shared = ["bbl", "units", "price", "borough", "1000010001",
              "2000020002", "MN"]
    sst = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
        f' count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        # header: A1..D1 shared strings 0..3
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>'
        '<c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>'
        "</row>"
        # row 2: shared bbl, int units, float price, shared borough
        '<row r="2">'
        '<c r="A2" t="s"><v>4</v></c><c r="B2"><v>10</v></c>'
        '<c r="C2"><v>1250000.5</v></c><c r="D2" t="s"><v>6</v></c>'
        "</row>"
        # row 3: shared bbl, int units, MISSING price, inline borough
        '<row r="3">'
        '<c r="A3" t="s"><v>5</v></c><c r="B3"><v>5</v></c>'
        '<c r="D3" t="inlineStr"><is><t>BK</t></is></c>'
        "</row>"
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", _WB_XML.format(name=sheet_name))
        zf.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


class TestStdlibXlsxReader:
    def test_rows_types_and_gaps(self, tmp_path):
        p = str(tmp_path / "dof.xlsx")
        write_fixture_xlsx(p)
        rows = read_xlsx_rows(p)
        assert rows == [
            ["bbl", "units", "price", "borough"],
            ["1000010001", 10, 1250000.5, "MN"],
            ["2000020002", 5, None, "BK"],
        ]

    def test_sheet_by_name(self, tmp_path):
        p = str(tmp_path / "named.xlsx")
        write_fixture_xlsx(p, sheet_name="sales")
        assert read_xlsx_rows(p, "sales")[0][0] == "bbl"
        with pytest.raises(KeyError):
            read_xlsx_rows(p, "nope")

    def test_legacy_xls_raises_clear_error(self, tmp_path):
        p = tmp_path / "old.xls"
        p.write_bytes(b"\xd0\xcf\x11\xe0 not a zip")
        with pytest.raises(ValueError, match="BIFF"):
            read_xlsx_rows(str(p))


class TestReadExcelEndToEnd:
    SCHEMA = T.StructType(
        [
            T.StructField("bbl", T.StringType()),
            T.StructField("units", T.IntegerType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("borough", T.StringType()),
        ]
    )

    def test_typed_dataframe_in_container(self, spark, tmp_path):
        """The S5 gap from rounds 1-2: this exercises read_excel
        ACTUALLY EXECUTING in this container (pandas has no engine
        here, so the stdlib fallback is the live path)."""
        p = str(tmp_path / "dof_annual_sales.xlsx")
        write_fixture_xlsx(p)
        df = read_excel(spark, p, self.SCHEMA)
        assert [f.dataType for f in df.schema.fields] == [
            f.dataType for f in self.SCHEMA.fields
        ]
        rows = {r["bbl"]: r for r in df.collect()}
        assert rows["1000010001"]["units"] == 10
        assert rows["1000010001"]["price"] == 1250000.5
        assert rows["2000020002"]["price"] is None
        assert rows["2000020002"]["borough"] == "BK"

    def test_schema_drift_raises(self, spark, tmp_path):
        p = str(tmp_path / "drift.xlsx")
        write_fixture_xlsx(p)
        bad = T.StructType([T.StructField("only_one", T.StringType())])
        with pytest.raises(ValueError, match="schema drift"):
            read_excel(spark, p, bad)