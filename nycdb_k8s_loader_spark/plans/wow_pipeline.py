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
