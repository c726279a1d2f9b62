"""w01: the WOW pipeline end-to-end as a driver-verifiable query.

Everything the reference's marquee path does (wowutil.py:144-186) runs
inside one catalog entry: synthesize the WOW dependency closure's
source CSVs deterministically FROM the TPC-H-ish parquet tables, run
``Engine.load_all(["wow"])`` (typed CSV ingestion → staging → pre-SQL
transpile → landlord normalization → portfolio connected components →
post-SQL rollup → atomic publish), and return the published
``wow.wow_bldgs`` table.

The DuckDB oracle replays the identical derivation in pure SQL over
the same parquet — including the portfolio graph, whose connected
components it computes with a recursive CTE (the graph's nodes are
normalized landlord NAMES: ≤ 700 at any sf by construction, so the
transitive-closure walk is metadata-scale even though the Spark side
uses the fully distributed operator).

Derivation map (synthetic → wow source tables):
- hpd_registrations ← customer (bbl = 'BBL'||custkey, boro = segment)
- hpd_contacts     ← customer: name 'Owner g.v llc.' with g = k%100,
  v = k%7; addr = (k%3)||' Group g St'. Names repeat across customers
  (700 distinct), addresses bridge names within a g-group → genuine
  multi-hop portfolio merging, deterministic at every sf.
- hpd_violations / hpd_complaints ← orders (class/category from
  priority, dates = o_orderdate)
- acris master/legals ← lineitem (⋈ orders for the lot), docdate NULL
  every 4th line to exercise the coalesce
- rentstab_summary ← customer with modular NULL holes
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nycdb_k8s_loader_spark.plans.catalog import register

RECENT = "1997-06-01"

_GEN_COLS = {
    "hpd_registrations": ["registrationid", "bbl", "boro"],
    "hpd_contacts": [
        "registrationcontactid", "registrationid", "type",
        "corporationname", "businesshousenumber", "businessstreetname",
    ],
    "hpd_violations": [
        "violationid", "bbl", "class", "inspectiondate", "currentstatus",
    ],
    "hpd_complaints": ["complaintid", "bbl", "majorcategory", "receiveddate"],
    "real_property_master": [
        "documentid", "doctype", "docdate", "recordedfiled", "docamount",
    ],
    "real_property_legals": ["documentid", "bbl"],
    "real_property_parties": ["documentid", "recordtype", "partytype", "name"],
    "rentstab_summary": ["ucbbl", "unitsstab2007", "uc2021"],
}


def _synth_sources(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """The deterministic derivation, as DataFrames."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    k = F.col("c_custkey")
    s = lambda c: c.cast("string")  # noqa: E731
    regs = customer.select(
        k.cast("int").alias("registrationid"),
        F.concat(F.lit("BBL"), s(k)).alias("bbl"),
        F.col("c_mktsegment").alias("boro"),
    )
    contacts = customer.select(
        k.cast("int").alias("registrationcontactid"),
        k.cast("int").alias("registrationid"),
        F.when(k % 13 == 0, F.lit("SiteManager"))
        .otherwise(F.lit("CorporateOwner"))
        .alias("type"),
        F.when(k % 50 == 0, F.lit(None).cast("string"))
        .otherwise(
            F.concat(
                F.lit("Owner "), s(k % 100), F.lit("."), s(k % 7),
                F.lit(" llc."),
            )
        )
        .alias("corporationname"),
        s(k % 3).alias("businesshousenumber"),
        F.concat(F.lit("Group "), s(k % 100), F.lit(" St")).alias(
            "businessstreetname"
        ),
    )
    viol = orders.select(
        F.col("o_orderkey").alias("violationid"),
        F.concat(F.lit("BBL"), s(F.col("o_custkey"))).alias("bbl"),
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("C"))
        .when(F.col("o_orderpriority") == "2-HIGH", F.lit("B"))
        .otherwise(F.lit("A"))
        .alias("class"),
        F.col("o_orderdate").alias("inspectiondate"),
        F.when(F.col("o_orderstatus") == "O", F.lit("Open"))
        .otherwise(F.lit("Close"))
        .alias("currentstatus"),
    )
    comp = orders.select(
        F.col("o_orderkey").alias("complaintid"),
        F.concat(F.lit("BBL"), s(F.col("o_custkey"))).alias("bbl"),
        F.col("o_orderpriority").alias("majorcategory"),
        F.col("o_orderdate").alias("receiveddate"),
    )
    docid = F.concat(
        F.lit("D"), s(F.col("l_orderkey")), F.lit("-"), s(F.col("l_linenumber"))
    )
    master = lineitem.select(
        docid.alias("documentid"),
        F.when(F.col("l_returnflag") == "R", F.lit("DEED"))
        .when(F.col("l_linestatus") == "O", F.lit("DEEDO"))
        .otherwise(F.lit("MTGE"))
        .alias("doctype"),
        F.when(F.col("l_linenumber") % 4 == 0, F.lit(None).cast("timestamp"))
        .otherwise(F.col("l_shipdate"))
        .alias("docdate"),
        F.col("l_shipdate").alias("recordedfiled"),
        F.col("l_extendedprice").alias("docamount"),
    )
    legals = (
        lineitem.join(
            orders.select("o_orderkey", "o_custkey"),
            lineitem.l_orderkey == F.col("o_orderkey"),
        )
        .select(
            docid.alias("documentid"),
            F.concat(F.lit("BBL"), s(F.col("o_custkey"))).alias("bbl"),
        )
    )
    parties = lineitem.select(
        docid.alias("documentid"),
        F.lit("P").alias("recordtype"),
        (F.col("l_linenumber") % 2 + 1).cast("int").alias("partytype"),
        F.concat(F.lit("Party "), s(F.col("l_suppkey"))).alias("name"),
    )
    rentstab = customer.select(
        F.concat(F.lit("BBL"), s(k)).alias("ucbbl"),
        F.when(k % 10 == 0, F.lit(None).cast("int"))
        .otherwise((F.col("c_nationkey") * 3).cast("int"))
        .alias("unitsstab2007"),
        F.when(k % 7 == 0, F.lit(None).cast("int"))
        .otherwise((k % 40).cast("int"))
        .alias("uc2021"),
    )
    return {
        "hpd_registrations": regs,
        "hpd_contacts": contacts,
        "hpd_violations": viol,
        "hpd_complaints": comp,
        "real_property_master": master,
        "real_property_legals": legals,
        "real_property_parties": parties,
        "rentstab_summary": rentstab,
    }


def _write_source_csvs(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the synthetic sources as CSV files (what the engine
    'downloads'). All columns stringified Spark-side first: timestamps
    as ISO-T (the CSV reader's default parse format) and NULLs as
    empty fields — pandas would otherwise promote nullable ints to
    floats ('10.0') that a typed IntegerType scan rejects."""
    out_dir = "/tmp/wow_synth_" + re.sub(r"\W+", "_", sf_dir).strip("_")
    os.makedirs(out_dir, exist_ok=True)
    # The derivation is a pure function of the source parquet, so the
    # CSVs are cache-valid as long as those files are unchanged —
    # skip the (driver-side) regeneration on repeat runs.
    sig = str(
        [
            (t, os.path.getmtime(f"{sf_dir}/{t}.parquet"),
             os.path.getsize(f"{sf_dir}/{t}.parquet"))
            for t in ("customer", "orders", "lineitem")
        ]
    )
    marker = os.path.join(out_dir, "_SOURCES")
    if (
        os.path.exists(marker)
        and open(marker).read() == sig
        and all(
            os.path.exists(os.path.join(out_dir, f"{n}.csv"))
            for n in _GEN_COLS
        )
    ):
        return out_dir
    from nycdb_k8s_loader_spark.plans.fixture_cache import (
        collect_fixture_pdf,
    )

    for name, df in _synth_sources(spark, sf_dir).items():
        pdf = collect_fixture_pdf(df)
        pdf.to_csv(os.path.join(out_dir, f"{name}.csv"), index=False)
    with open(marker, "w") as f:
        f.write(sig)
    return out_dir


_W01_ORACLE = f"""
WITH RECURSIVE regs AS (
    SELECT c_custkey::INT AS registrationid,
           'BBL' || c_custkey AS bbl,
           c_mktsegment AS boro
    FROM customer
),
contacts AS (
    SELECT c_custkey::INT AS registrationid,
           CASE WHEN c_custkey % 13 = 0 THEN 'SiteManager'
                ELSE 'CorporateOwner' END AS type,
           CASE WHEN c_custkey % 50 = 0 THEN NULL
                ELSE 'Owner ' || (c_custkey % 100) || '.' ||
                     (c_custkey % 7) || ' llc.' END AS corporationname,
           (c_custkey % 3)::VARCHAR AS housenum,
           'Group ' || (c_custkey % 100) || ' St' AS street
    FROM customer
),
landlords AS (
    SELECT c.registrationid, r.bbl,
           trim(regexp_replace(upper(c.corporationname),
                               '[^A-Z0-9]+', ' ', 'g')) AS name,
           upper(c.housenum || ' ' || c.street) AS bizaddr
    FROM contacts c
    JOIN regs r ON c.registrationid = r.registrationid
    WHERE c.type IN ('CorporateOwner', 'HeadOfficer', 'IndividualOwner')
      AND c.corporationname IS NOT NULL
),
ll AS (SELECT DISTINCT name, bizaddr FROM landlords),
edges AS (
    SELECT DISTINCT a.name AS na, b.name AS nb
    FROM ll a JOIN ll b ON a.bizaddr = b.bizaddr AND a.name < b.name
),
sym AS (
    SELECT na, nb FROM edges
    UNION
    SELECT nb AS na, na AS nb FROM edges
),
walk(node, label) AS (
    SELECT DISTINCT na AS node, na AS label FROM sym
    UNION
    SELECT s.na, w.label FROM walk w JOIN sym s ON w.node = s.nb
),
comp AS (SELECT node, MIN(label) AS component FROM walk GROUP BY node),
portfolios AS (
    SELECT n.name, coalesce(c.component, n.name) AS portfolio_id
    FROM (SELECT DISTINCT name FROM ll) n
    LEFT JOIN comp c ON n.name = c.node
),
regowners AS (
    SELECT bbl, MIN(name) AS ownername FROM landlords GROUP BY bbl
),
master AS (
    SELECT 'D' || l_orderkey || '-' || l_linenumber AS documentid,
           CASE WHEN l_returnflag = 'R' THEN 'DEED'
                WHEN l_linestatus = 'O' THEN 'DEEDO'
                ELSE 'MTGE' END AS doctype,
           CASE WHEN l_linenumber % 4 = 0 THEN NULL
                ELSE l_shipdate END AS docdate,
           l_shipdate AS recordedfiled,
           l_extendedprice AS docamount
    FROM lineitem
),
legals AS (
    SELECT 'D' || l_orderkey || '-' || l_linenumber AS documentid,
           'BBL' || o_custkey AS bbl
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deeds AS (
    SELECT l.bbl, m.documentid,
           coalesce(m.docdate, m.recordedfiled) AS docdate,
           m.docamount
    FROM master m JOIN legals l ON m.documentid = l.documentid
    WHERE m.docamount > 1 AND m.doctype IN ('DEED', 'DEEDO')
),
lastsale AS (
    SELECT bbl, documentid AS lastsale_docid, docdate AS lastsale_date,
           docamount AS lastsale_amount
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY bbl
            ORDER BY docdate DESC, documentid DESC, docamount DESC
        ) AS rn FROM deeds
    ) WHERE rn = 1
),
viol AS (
    SELECT 'BBL' || o_custkey AS bbl,
           count(*)::BIGINT AS total_violations,
           count(*) FILTER (WHERE o_orderpriority NOT IN
               ('1-URGENT', '2-HIGH'))::BIGINT AS classa_violations,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH')::BIGINT
               AS classb_violations,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT')::BIGINT
               AS classc_violations,
           count(*) FILTER (WHERE o_orderstatus = 'O')::BIGINT
               AS open_violations,
           count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '{RECENT} 00:00:00')::BIGINT
               AS recent_violations
    FROM orders GROUP BY 1
),
comp_agg AS (
    SELECT 'BBL' || o_custkey AS bbl,
           count(*)::BIGINT AS total_complaints,
           count(*) FILTER (WHERE o_orderdate >= TIMESTAMP '{RECENT} 00:00:00')::BIGINT
               AS recent_complaints
    FROM orders GROUP BY 1
),
rentstab AS (
    SELECT 'BBL' || c_custkey AS ucbbl,
           CASE WHEN c_custkey % 10 = 0 THEN NULL
                ELSE c_nationkey * 3 END AS unitsstab2007,
           CASE WHEN c_custkey % 7 = 0 THEN NULL
                ELSE c_custkey % 40 END AS uc2021
    FROM customer
)
SELECT
    r.bbl, r.boro, o.ownername, p.portfolio_id,
    coalesce(v.total_violations, 0)::BIGINT AS total_violations,
    coalesce(v.classa_violations, 0)::BIGINT AS classa_violations,
    coalesce(v.classb_violations, 0)::BIGINT AS classb_violations,
    coalesce(v.classc_violations, 0)::BIGINT AS classc_violations,
    coalesce(v.open_violations, 0)::BIGINT AS open_violations,
    coalesce(v.recent_violations, 0)::BIGINT AS recent_violations,
    coalesce(cp.total_complaints, 0)::BIGINT AS total_complaints,
    coalesce(cp.recent_complaints, 0)::BIGINT AS recent_complaints,
    s.lastsale_docid, s.lastsale_date, s.lastsale_amount,
    coalesce(rs.unitsstab2007, 0)::INT AS rsunits2007,
    coalesce(rs.uc2021, 0)::INT AS rsunitslatest
FROM regs r
LEFT JOIN regowners o ON r.bbl = o.bbl
LEFT JOIN portfolios p ON o.ownername = p.name
LEFT JOIN viol v ON r.bbl = v.bbl
LEFT JOIN comp_agg cp ON r.bbl = cp.bbl
LEFT JOIN lastsale s ON r.bbl = s.bbl
LEFT JOIN rentstab rs ON r.bbl = rs.ucbbl
"""


@register(
    "w01_wow_bldgs_e2e",
    _W01_ORACLE,
    doc="The WOW pipeline end-to-end (reference wowutil.py:144-186): "
        "synthetic source CSVs → Engine.load_all(['wow']) — typed CSV "
        "scans, staging namespaces, transpiled Postgres pre/post SQL, "
        "landlord name normalization, portfolio connected components, "
        "atomic publish — returning the published wow.wow_bldgs. The "
        "oracle replays the whole derivation in DuckDB, computing the "
        "portfolio components with a recursive CTE over the (metadata-"
        "scale, ≤700-node) landlord-name graph while Spark runs the "
        "distributed min-label operator. Class-C analog maps to "
        "'1-URGENT' so the FILTER counts line up by construction.",
    tags=("e2e", "wow", "engine", "graph"),
)
def w01(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nycdb_k8s_loader_spark.datasets import WOW_SCHEMA, wow_registry
    from nycdb_k8s_loader_spark.engine import Engine
    from nycdb_k8s_loader_spark.state.kvstore import DictKVStore
    from nycdb_k8s_loader_spark.state.lastmod import FetchResult

    src_dir = _write_source_csvs(spark, sf_dir)

    def downloader(url: str, dest: str) -> None:
        name = url.rsplit("/", 1)[-1]
        with open(os.path.join(src_dir, name)) as f, open(dest, "w") as g:
            g.write(f.read())

    eng = Engine(
        spark,
        wow_registry(),
        DictKVStore(),
        target_db="wow_src",
        landing_root=os.path.join(src_dir, "landing"),
        transport=lambda url, headers: FetchResult(200, etag='"w01"'),
        downloader=downloader,
    )
    eng.load_all(["wow"])
    return spark.table(f"{WOW_SCHEMA}.wow_bldgs").select(
        "bbl", "boro", "ownername", "portfolio_id",
        "total_violations", "classa_violations", "classb_violations",
        "classc_violations", "open_violations",
        "recent_violations", "total_complaints", "recent_complaints",
        "lastsale_docid", "lastsale_date", "lastsale_amount",
        "rsunits2007", "rsunitslatest",
    )


# --- w03: the reference's WIDEST real SQL, byte-for-byte, as a -------
# --- perpetually-verified catalog row (round-9 verdict #8) -----------

# the ONE documented upstream patch (tests/test_transpile.py carries
# the same pair and asserts the broken fragment is still present):
# the complaints subquery reads `from hpd_complaints_and_problems
# using(complaintid)` yet filters on an `h.receiveddate` alias no
# engine could resolve — the unabridged upstream query joins
# hpd_complaints h to hpd_complaint_problems; the patch restores
# exactly that join and nothing else.
_W03_BROKEN = "from hpd_complaints_and_problems using(complaintid)"
_W03_PATCH = (
    "from hpd_complaints as h join hpd_complaint_problems "
    "using(complaintid)"
)


def _w03_sources(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Deterministic derivations of the wow_2021 script's 12 source
    tables from the parquet fixtures. Determinism discipline:
    complaint dates are either 1990s (never recent) or shifted +110
    years (recent until ~2095), so CURRENT_DATE − 3y can't flip a
    verdict between engines or runs; exactly one qualifying deed per
    bbl, so the script's ordered first() has a single candidate."""
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("c_custkey")
    ok = F.col("o_orderkey")
    s = lambda c: c.cast("string")  # noqa: E731
    bbl = F.concat(F.lit("BBL"), s(k))
    obbl = F.concat(F.lit("BBL"), s(F.col("o_custkey")))

    regs = customer.select(
        k.cast("int").alias("registrationid"),
        bbl.alias("bbl"),
        F.col("c_mktsegment").alias("boro"),
    )
    viol = orders.select(
        obbl.alias("bbl"),
        F.when(F.col("o_orderstatus") == "O", F.lit("Open"))
        .otherwise(F.lit("Close"))
        .alias("violationstatus"),
    )
    pluto = customer.select(
        bbl.alias("bbl"),
        (F.col("c_nationkey") * 2).cast("int").alias("unitsres"),
        (F.lit(1900) + k % 100).cast("int").alias("yearbuilt"),
        ((k % 200) * 0.25).alias("lat"),
        (-(k % 400) * 0.125).alias("lng"),
    )
    evict = orders.select(
        obbl.alias("bbl"),
        F.when(ok % 4 == 0, F.lit("COMMERCIAL"))
        .otherwise(F.lit("RESIDENTIAL"))
        .alias("residentialcommercialind"),
    )
    rs_summary = customer.filter(k % 11 != 0).select(
        bbl.alias("ucbbl"),
        F.when(k % 10 == 0, F.lit(None).cast("int"))
        .otherwise((F.col("c_nationkey") * 3).cast("int"))
        .alias("unitsstab2007"),
    )
    rs_v2 = customer.filter(k % 13 != 0).select(
        bbl.alias("ucbbl"),
        F.when(k % 7 == 0, F.lit(None).cast("int"))
        .otherwise((k % 40).cast("int"))
        .alias("uc2021"),
    )
    major = F.when(ok % 3 == 0, F.lit("GENERAL")).otherwise(
        F.col("o_orderpriority")
    )
    complaints = orders.select(
        ok.cast("int").alias("complaintid"),
        obbl.alias("bbl"),
        F.when(
            ok % 5 == 0,
            F.date_add(F.col("o_orderdate").cast("date"), 40177),
        )
        .otherwise(F.col("o_orderdate").cast("date"))
        .alias("receiveddate"),
    )
    problems = orders.select(
        ok.cast("int").alias("complaintid"),
        major.alias("majorcategory"),
        F.when(ok % 2 == 0, F.lit("COOKING GAS"))
        .otherwise(F.lit("HEAT/HOT WATER"))
        .alias("minorcategory"),
    )
    exemptions = (
        customer.filter(k % 5 != 0)
        .select(
            bbl.alias("bbl"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("exmpcode"),
                        (F.lit(1950) + k % 50).cast("int").alias(
                            "benftstart"
                        ),
                    ),
                    F.struct(
                        F.lit(2).alias("exmpcode"),
                        (F.lit(2000) + k % 20).cast("int").alias(
                            "benftstart"
                        ),
                    ),
                    F.struct(
                        F.lit(3).alias("exmpcode"),
                        F.lit(1900).cast("int").alias("benftstart"),
                    ),
                )
            ).alias("e"),
        )
        .select("bbl", "e.exmpcode", "e.benftstart")
    )
    codes = spark.createDataFrame(
        [
            (1, "J-51 ALTERATION"),
            (2, "421A NEW CONSTRUCTION"),
            (3, "VETERAN"),
        ],
        "exemptcode int, description string",
    )
    # deeds: ONE qualifying DEED per bbl (docdate NULL every 4th key,
    # exercising the coalesce), plus a MTGE (doctype-filtered) and a
    # $1 DEED (amount-filtered) per bbl
    datestr = lambda base, kk: F.concat(  # noqa: E731
        F.lit(base),
        F.lpad(s(kk % 12 + 1), 2, "0"),
        F.lit("-"),
        F.lpad(s(kk % 28 + 1), 2, "0"),
    )
    master = (
        customer.select(
            F.explode(
                F.array(
                    F.struct(
                        F.concat(F.lit("D"), s(k)).alias("documentid"),
                        F.lit("DEED").alias("doctype"),
                        F.when(k % 4 == 0, F.lit(None).cast("string"))
                        .otherwise(datestr("2015-", k))
                        .alias("docdate"),
                        datestr("2014-", k).alias("recordedfiled"),
                        ((k % 999 + 2).cast("double")).alias(
                            "docamount"
                        ),
                    ),
                    F.struct(
                        F.concat(F.lit("M"), s(k)).alias("documentid"),
                        F.lit("MTGE").alias("doctype"),
                        datestr("2016-", k).alias("docdate"),
                        datestr("2016-", k).alias("recordedfiled"),
                        F.lit(9000.0).alias("docamount"),
                    ),
                    F.struct(
                        F.concat(F.lit("X"), s(k)).alias("documentid"),
                        F.lit("DEEDO").alias("doctype"),
                        datestr("2017-", k).alias("docdate"),
                        datestr("2017-", k).alias("recordedfiled"),
                        F.lit(1.0).alias("docamount"),
                    ),
                )
            ).alias("d"),
        )
        .select("d.*")
    )
    legals = customer.select(
        F.explode(
            F.array(
                F.concat(F.lit("D"), s(k)),
                F.concat(F.lit("M"), s(k)),
                F.concat(F.lit("X"), s(k)),
            )
        ).alias("documentid"),
        bbl.alias("bbl"),
    )
    return {
        "hpd_registrations_with_contacts": regs,
        "hpd_violations": viol,
        "pluto_19v2": pluto,
        "marshal_evictions_all": evict,
        "rentstab_summary": rs_summary,
        "rentstab_v2": rs_v2,
        "hpd_complaints": complaints,
        "hpd_complaint_problems": problems,
        "dof_exemptions": exemptions,
        "dof_exemption_classification_codes": codes,
        "real_property_master": master,
        "real_property_legals": legals,
    }


_W03_ORACLE = """
WITH regs AS (
    SELECT c_custkey::INT AS registrationid,
           'BBL' || c_custkey AS bbl, c_mktsegment AS boro
    FROM customer
),
viol AS (
    SELECT 'BBL' || o_custkey AS bbl,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS opentotal,
           COUNT(*) AS total
    FROM orders GROUP BY 1
),
comp_rows AS (
    SELECT 'BBL' || o_custkey AS bbl,
           CASE WHEN (CASE WHEN o_orderkey % 3 = 0 THEN 'GENERAL'
                           ELSE o_orderpriority END)
                     IN ('UNSANITARY CONDITION', 'GENERAL')
                THEN (CASE WHEN o_orderkey % 2 = 0 THEN 'COOKING GAS'
                           ELSE 'HEAT/HOT WATER' END)
                ELSE (CASE WHEN o_orderkey % 3 = 0 THEN 'GENERAL'
                           ELSE o_orderpriority END) END
               AS complainttype,
           CASE WHEN o_orderkey % 5 = 0
                THEN CAST(o_orderdate AS DATE) + 40177
                ELSE CAST(o_orderdate AS DATE) END AS receiveddate
    FROM orders
),
comp_by_type AS (
    SELECT bbl, complainttype,
           COUNT(*) FILTER (WHERE receiveddate >
               CURRENT_DATE - INTERVAL '3 years') AS rec,
           COUNT(*) AS tot
    FROM comp_rows GROUP BY 1, 2
),
compl AS (
    SELECT bbl, SUM(tot) AS totalcomplaints,
           SUM(rec) AS recentcomplaints
    FROM comp_by_type GROUP BY 1
),
pluto AS (
    SELECT 'BBL' || c_custkey AS bbl,
           (c_nationkey * 2)::INT AS unitsres,
           (1900 + c_custkey % 100)::INT AS yearbuilt,
           ((c_custkey % 200) * 0.25)::DOUBLE AS lat,
           (-(c_custkey % 400) * 0.125)::DOUBLE AS lng
    FROM customer
),
evict AS (
    SELECT 'BBL' || o_custkey AS bbl, COUNT(*) AS evictions
    FROM orders WHERE o_orderkey % 4 <> 0
    GROUP BY 1
),
rentstab AS (
    SELECT s.ucbbl,
           COALESCE(s.unitsstab2007, 0) AS rsunits2007,
           COALESCE(v.uc2021, 0) AS rsunitslatest,
           COALESCE(v.uc2021, 0) - COALESCE(s.unitsstab2007, 0)
               AS rsdiff
    FROM (SELECT 'BBL' || c_custkey AS ucbbl,
                 CASE WHEN c_custkey % 10 = 0 THEN NULL
                      ELSE (c_nationkey * 3)::INT END AS unitsstab2007
          FROM customer WHERE c_custkey % 11 <> 0) s
    LEFT JOIN (SELECT 'BBL' || c_custkey AS ucbbl,
                      CASE WHEN c_custkey % 7 = 0 THEN NULL
                           ELSE (c_custkey % 40)::INT END AS uc2021
               FROM customer WHERE c_custkey % 13 <> 0) v
    USING (ucbbl)
),
exemptions AS (
    SELECT 'BBL' || c_custkey AS bbl,
           (1950 + c_custkey % 50)::SMALLINT AS yearstartedj51,
           (2000 + c_custkey % 20)::SMALLINT AS yearstarted421a
    FROM customer WHERE c_custkey % 5 <> 0
),
firstdeeds AS (
    SELECT 'BBL' || c_custkey AS bbl,
           'D' || c_custkey AS lastsaleacrisid,
           CASE WHEN c_custkey % 4 = 0
                THEN '2014-' || lpad((c_custkey % 12 + 1)::VARCHAR, 2, '0')
                     || '-' || lpad((c_custkey % 28 + 1)::VARCHAR, 2, '0')
                ELSE '2015-' || lpad((c_custkey % 12 + 1)::VARCHAR, 2, '0')
                     || '-' || lpad((c_custkey % 28 + 1)::VARCHAR, 2, '0')
                END AS lastsaledate,
           (c_custkey % 999 + 2)::DOUBLE AS lastsaleamount
    FROM customer
)
SELECT r.registrationid, r.bbl, r.boro,
       COALESCE(v.total, 0)::INT AS totalviolations,
       COALESCE(v.opentotal, 0)::INT AS openviolations,
       COALESCE(c.totalcomplaints, 0)::INT AS totalcomplaints,
       COALESCE(c.recentcomplaints, 0)::INT AS recentcomplaints,
       p.unitsres, p.yearbuilt, p.lat, p.lng,
       e.evictions,
       rs.rsunits2007, rs.rsunitslatest,
       2021 AS rsunitslatestyear,
       rs.rsdiff,
       x.yearstartedj51, x.yearstarted421a,
       f.lastsaleacrisid, f.lastsaledate, f.lastsaleamount
FROM regs r
LEFT JOIN viol v ON r.bbl = v.bbl
LEFT JOIN compl c ON r.bbl = c.bbl
LEFT JOIN pluto p ON r.bbl = p.bbl
LEFT JOIN evict e ON r.bbl = e.bbl
LEFT JOIN exemptions x ON r.bbl = x.bbl
LEFT JOIN rentstab rs ON r.bbl = rs.ucbbl
LEFT JOIN firstdeeds f ON r.bbl = f.bbl
"""


@register(
    "w03_wow_2021_bldgs",
    _W03_ORACLE,
    doc="The reference's WIDEST shipped SQL "
        "(tests/sql/wow_2021_create_bldgs_table.sql — 12 source "
        "tables, FILTER aggregates, interval arithmetic, ~* regex, "
        "exemption classification joins, ordered first(), DISTINCT "
        "ON, DROP CASCADE + ALTER RENAME) executed byte-for-byte "
        "through the transpiler against deterministic parquet-derived "
        "sources, as a perpetually-verified catalog row (it "
        "previously ran only under pytest). ONE documented upstream "
        "patch (the h-alias complaints join — asserted present so an "
        "upstream fix surfaces). The json_agg column "
        "(recentcomplaintsbytype) EXECUTES in the pipeline but is "
        "not in the compared projection — cross-engine JSON text "
        "identity is a formatting contract, not a semantics one. "
        "Dates are 1990s-or-+110-years so CURRENT_DATE − 3y can "
        "never flip a verdict between engines or run days; exactly "
        "one qualifying deed per bbl makes the ordered first() "
        "single-candidate. Oracle: the whole derivation replayed as "
        "closed-form DuckDB SQL.",
    tags=("e2e", "wow", "transpile", "sql"),
)
def w03(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nycdb_k8s_loader_spark.publish.parse_created_tables import (
        split_statements,
    )
    from nycdb_k8s_loader_spark.publish.resolver import SearchPathResolver
    from nycdb_k8s_loader_spark.publish.transpile import transpile_pg

    ref_sql = os.path.join(
        "/root/reference/tests/sql", "wow_2021_create_bldgs_table.sql"
    )
    text = open(ref_sql).read()
    if _W03_BROKEN not in text:
        raise ValueError(
            "w03: upstream fixture no longer carries the documented "
            "broken complaints join — re-audit the patch"
        )
    text = text.replace(_W03_BROKEN, _W03_PATCH)

    sources = _w03_sources(spark, sf_dir)
    for name, df in sources.items():
        df.createOrReplaceTempView(name)
    try:
        spark.sql("CREATE DATABASE IF NOT EXISTS wow2021")
        # rename of a MANAGED table keeps its original location in
        # Spark 3+, so after one run `wow_bldgs` lives at
        # .../wow_bldgs_temporary and the next CTAS hits
        # LOCATION_ALREADY_EXISTS — drop BOTH tables (freeing that
        # location) and sweep any orphaned dir the catalog lost
        spark.sql("DROP TABLE IF EXISTS wow2021.wow_bldgs")
        spark.sql("DROP TABLE IF EXISTS wow2021.wow_bldgs_temporary")
        import shutil

        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        for t in ("wow_bldgs", "wow_bldgs_temporary"):
            shutil.rmtree(
                os.path.join(wh, "wow2021.db", t), ignore_errors=True
            )
        resolver = SearchPathResolver(
            spark, ["wow2021"], ddl_db="wow2021"
        )
        for stmt in split_statements(text):
            stripped = stmt.strip()
            if not stripped or stripped.upper().startswith(
                "CREATE INDEX"
            ):
                continue  # K7: index DDL is a layout decision here
            resolver.sql(transpile_pg(stripped))
        return spark.table("wow2021.wow_bldgs").select(
            "registrationid", "bbl", "boro",
            "totalviolations", "openviolations",
            "totalcomplaints", "recentcomplaints",
            "unitsres", "yearbuilt", "lat", "lng",
            "evictions", "rsunits2007", "rsunitslatest",
            "rsunitslatestyear", "rsdiff",
            "yearstartedj51", "yearstarted421a",
            "lastsaleacrisid", "lastsaledate", "lastsaleamount",
        )
    finally:
        for name in sources:
            spark.catalog.dropTempView(name)
