"""Concrete dataset registry entries + the WOW custom-dataset builder.

The reference consumes ~36 loadable datasets from the nycdb registry
(/root/reference/load_dataset.py:92-118) and layers four custom
pipelines on top (wow/oca/signature/good-cause, dispatch at
load_dataset.py:319-338). This module ships the concrete
:class:`~nycdb_k8s_loader_spark.registry.DatasetDef` entries for the
WOW dependency closure — typed StructTypes, source-file manifests,
dependency edges — plus :func:`build_wow`, the Spark re-expression of
the reference's marquee pipeline (/root/reference/wowutil.py:144-186):

    pre-SQL (transpiled Postgres scripts, temp-schema scoped)
      → populate_landlords  (name standardization, Python step)
      → populate_portfolios (landlord graph → connected components)
      → post-SQL (wow_bldgs rollup)
      → atomic publish into the ``wow`` namespace
      → re-register function DDL post-swap

Scale notes (the 100 TB story the reference's driver-side networkx
portfolio build cannot tell, wowutil.py:74-85):

- Every step is a DataFrame plan: the landlord graph is an edge
  DataFrame, components come from distributed min-label propagation
  (operators/graph.py), and the per-address pair expansion is bounded
  by contacts-per-address (tiny, Zipf-capped in practice).
- The rollup SQL left-join pipeline aggregates each dimension table on
  the join key before joining — map-side combinable, dim results stay
  small relative to the registrations spine, AQE broadcasts them.

Source URLs are deployment metadata: real deployments point these at
the NYC open-data portal mirrors; tests and the driver inject a fake
transport + downloader (the engine treats URLs as opaque).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nycdb_k8s_loader_spark.registry import (
    DatasetDef,
    Registry,
    SourceFile,
    TableDef,
)

SQL_DIR = os.path.join(os.path.dirname(__file__), "sql")

#: Target namespace for the published WOW tables (reference
#: wowutil.py:44 ``WOW_SCHEMA = "wow"``).
WOW_SCHEMA = "wow"

WOW_PRE_SCRIPTS = [os.path.join(SQL_DIR, "wow_pre_landlords.sql")]
WOW_POST_SCRIPTS = [os.path.join(SQL_DIR, "wow_post_bldgs.sql")]

#: Tables produced by the Python populate steps rather than SQL —
#: preserved across publishes like the reference's
#: EXTRA_TABLES_TO_PRESERVE (wowutil.py:56).
WOW_PYTHON_TABLES = ["wow_landlords", "wow_portfolios"]


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


HPD_REGISTRATIONS_SCHEMA = _s(
    ("registrationid", T.IntegerType()),
    ("bbl", T.StringType()),
    ("boro", T.StringType()),
)

HPD_CONTACTS_SCHEMA = _s(
    ("registrationcontactid", T.IntegerType()),
    ("registrationid", T.IntegerType()),
    ("type", T.StringType()),
    ("corporationname", T.StringType()),
    ("businesshousenumber", T.StringType()),
    ("businessstreetname", T.StringType()),
)

HPD_VIOLATIONS_SCHEMA = _s(
    ("violationid", T.LongType()),
    ("bbl", T.StringType()),
    ("class", T.StringType()),
    ("inspectiondate", T.TimestampType()),
    ("currentstatus", T.StringType()),
)

HPD_COMPLAINTS_SCHEMA = _s(
    ("complaintid", T.LongType()),
    ("bbl", T.StringType()),
    ("majorcategory", T.StringType()),
    ("receiveddate", T.TimestampType()),
)

ACRIS_MASTER_SCHEMA = _s(
    ("documentid", T.StringType()),
    ("doctype", T.StringType()),
    ("docdate", T.TimestampType()),
    ("recordedfiled", T.TimestampType()),
    ("docamount", T.DoubleType()),
)

ACRIS_LEGALS_SCHEMA = _s(
    ("documentid", T.StringType()),
    ("bbl", T.StringType()),
)

RENTSTAB_SCHEMA = _s(
    ("ucbbl", T.StringType()),
    ("unitsstab2007", T.IntegerType()),
    ("uc2021", T.IntegerType()),
)

#: The WOW dependency closure's schemas by (dataset, table).
DATASET_TABLES: dict[str, list[TableDef]] = {
    "hpd_registrations": [TableDef("hpd_registrations", HPD_REGISTRATIONS_SCHEMA)],
    "hpd_contacts": [TableDef("hpd_contacts", HPD_CONTACTS_SCHEMA)],
    "hpd_violations": [TableDef("hpd_violations", HPD_VIOLATIONS_SCHEMA)],
    "hpd_complaints": [TableDef("hpd_complaints", HPD_COMPLAINTS_SCHEMA)],
    "acris": [
        TableDef(
            "real_property_master", ACRIS_MASTER_SCHEMA,
            files=["real_property_master.csv"],
        ),
        TableDef(
            "real_property_legals", ACRIS_LEGALS_SCHEMA,
            files=["real_property_legals.csv"],
        ),
    ],
    "rentstab": [TableDef("rentstab_summary", RENTSTAB_SCHEMA)],
}

#: wow's declared dependencies (reference: WOW_YML["dependencies"] via
#: tests/test_wowutil.py:9-11 — the hpd/acris/rentstab closure).
WOW_DEPENDENCIES = [
    "hpd_registrations",
    "hpd_contacts",
    "hpd_violations",
    "hpd_complaints",
    "acris",
    "rentstab",
]


def _standard_defs() -> list[DatasetDef]:
    out = []
    for name, tables in DATASET_TABLES.items():
        files = [
            SourceFile(
                url=f"https://nycdb-mirror.example.org/{t.name}.csv",
                dest=f"{t.name}.csv",
            )
            for t in tables
        ]
        out.append(DatasetDef(name=name, files=files, tables=tables))
    return out


def wow_registry() -> Registry:
    """Registry shipping the WOW closure + the wow custom dataset, so
    ``Engine(...).load_all(["wow"])`` executes end-to-end."""
    reg = Registry()
    for ds in _standard_defs():
        reg.add(ds)
    reg.add(
        DatasetDef(
            name="wow",
            # no source files: wow derives entirely from published
            # dependency tables, so the URL-change gate never skips it
            # (the reference rebuilds wow on schedule, wowutil.py:144).
            files=[],
            tables=[
                TableDef(t)
                for t in WOW_PYTHON_TABLES
                + ["wow_deeds", "wow_lastsale", "wow_viol", "wow_comp",
                   "wow_regowners", "wow_bldgs"]
            ],
            depends_on=list(WOW_DEPENDENCIES),
            schedule="wow",
            builder=build_wow,
        )
    )
    return reg


# -- the wow builder ----------------------------------------------------------


def _run_scripts(spark, resolver, scripts, function_stmts) -> list[str]:
    """Transpile + run every statement of each Postgres-dialect script;
    function DDL is collected for post-publish replay (reference
    wowutil.py:170-181). Returns created table names."""
    from nycdb_k8s_loader_spark.publish.parse_created_tables import (
        is_function_sql,
        parse_created_tables,
        split_statements,
    )
    from nycdb_k8s_loader_spark.publish.transpile import transpile_pg

    created: list[str] = []
    for script in scripts:
        with open(script, encoding="utf-8") as fh:
            raw = fh.read()
        for stmt in split_statements(raw):
            stmt = transpile_pg(stmt)
            if is_function_sql(stmt):
                function_stmts.append(stmt)
            else:
                resolver.sql(stmt)
            created += [
                t for t in parse_created_tables(stmt) if t not in created
            ]
    return created


def populate_landlords(spark: SparkSession, staging_db: str) -> None:
    """Landlord standardization (reference populate_landlords_table,
    wowutil.py:74-78 via portfoliograph.standardize): normalize raw
    owner names and business addresses from the pre-SQL base table.
    Pure column expressions — JVM-side, zero shuffle."""
    from nycdb_k8s_loader_spark.functions.text_similarity import (
        normalized_name,
    )

    base = spark.table(f"`{staging_db}`.`wow_landlords_base`")
    landlords = base.select(
        "registrationid",
        "bbl",
        normalized_name("rawname").alias("name"),
        F.upper(F.col("bizaddr")).alias("bizaddr"),
    ).filter(F.col("name") != "")
    landlords.write.mode("overwrite").saveAsTable(
        f"`{staging_db}`.`wow_landlords`"
    )  # epoch-named staging db: no cross-session orphan risk


def populate_portfolios(spark: SparkSession, staging_db: str) -> None:
    """Portfolio graph (reference populate_portfolios_table,
    wowutil.py:81-85): landlord names sharing a business address form
    edges; connected components are portfolios, labeled by the minimum
    member name.

    The reference materializes this graph driver-side with networkx —
    a non-starter at data scale. Here: per-address pair expansion
    (bounded by contacts-per-address) → distributed min-label
    propagation (operators/graph.py:26). Names not in any edge keep a
    singleton portfolio via the left-join coalesce."""
    from nycdb_k8s_loader_spark.operators.graph import connected_components

    ll = (
        spark.table(f"`{staging_db}`.`wow_landlords`")
        .select("name", "bizaddr")
        .distinct()
    )
    a = ll.select(F.col("name").alias("name_a"), "bizaddr")
    b = ll.select(F.col("name").alias("name_b"), "bizaddr")
    edges = (
        a.join(b, "bizaddr")
        .filter(F.col("name_a") < F.col("name_b"))
        .select("name_a", "name_b")
        .distinct()
    )
    comps = connected_components(edges, src="name_a", dst="name_b")
    names = ll.select("name").distinct()
    portfolios = (
        names.join(comps, names.name == comps.node, "left")
        .select(
            "name",
            F.coalesce(F.col("component"), F.col("name")).alias(
                "portfolio_id"
            ),
        )
    )
    portfolios.write.mode("overwrite").saveAsTable(
        f"`{staging_db}`.`wow_portfolios`"
    )


def build_wow(spark: SparkSession, engine) -> list[str]:
    """Custom-dataset builder for ``wow`` (reference build(),
    wowutil.py:144-186): staging namespace → pre-SQL → Python populate
    steps → post-SQL → atomic publish into WOW_SCHEMA → function
    replay. Idempotent: rerunning overwrites deterministically."""
    from nycdb_k8s_loader_spark.publish.protocol import Publisher
    from nycdb_k8s_loader_spark.publish.resolver import SearchPathResolver

    engine.notifier.safe_notify("Rebuilding Who Owns What tables...")
    pub = Publisher(spark, WOW_SCHEMA)
    function_stmts: list[str] = []
    with pub.staging("wow") as staging_db:
        resolver = SearchPathResolver(
            spark, [staging_db, *engine.search_path]
        )
        prev_db = spark.catalog.currentDatabase()
        spark.catalog.setCurrentDatabase(staging_db)
        try:
            created = _run_scripts(
                spark, resolver, WOW_PRE_SCRIPTS, function_stmts
            )
            populate_landlords(spark, staging_db)
            populate_portfolios(spark, staging_db)
            created += WOW_PYTHON_TABLES
            created += _run_scripts(
                spark, resolver, WOW_POST_SCRIPTS, function_stmts
            )
        finally:
            spark.catalog.setCurrentDatabase(prev_db)
        # the pre-SQL base table is scaffolding, not a published surface
        publish_list = [t for t in created if t != "wow_landlords_base"]
        published = pub.publish_tables(staging_db, publish_list)

    # Function DDL replay after the swap (wowutil.py:170-181: the temp
    # schema's functions died with it; re-create against the published
    # namespace).
    engine.functions.apply(spark)
    for stmt in function_stmts:
        spark.sql(stmt)
    engine.notifier.safe_notify("Finished rebuilding Who Owns What tables.")
    return published
