"""The rest of the reference's loadable dataset surface, as typed defs.

The reference schedules ~36 registry datasets (/root/reference/
scheduling.py:63-100) and its e2e matrix loads EVERY one
(/root/reference/tests/test_load_dataset.py:44-84: load → every table
>0 rows → reload → identical counts). datasets.py ships the WOW
dependency closure + the four custom pipelines; this module ships the
remaining scheduled datasets so ``Engine.load(name)`` works for the
whole surface a reference user can name.

Schema fidelity: the reference's column types live in the external
nycdb library's YAML (pinned at Dockerfile:37-47, not vendored here),
so these StructTypes are derived from the PUBLIC NYC open-data
portal schemas for each dataset (socrata column lists) — the key
analytic columns each dataset is actually joined/filtered on
downstream (bbl keys, dates, statuses, amounts), not exhaustive
column dumps. Real deployments extend a def's StructType without
touching the engine.

Two defs exercise the Excel path end-to-end (dof_annual_sales /
dof_421a — reference load_dataset.py:280-303 loads exactly these two
through xlrd); ``boundaries`` resolves the S6 shapefile de-scope as
attributes + WKT geometry strings (SURVEY §7: geometry ops live in
operators/geo.py; Sedona is the full-geometry path).

Scale note: every def here is a plain source→typed-table load — the
Spark work is a parallel typed CSV/xlsx scan and a staging write, no
shuffles. Breadth lives in the registry, not in per-dataset code.
"""

from __future__ import annotations

from pyspark.sql import types as T

from nycdb_k8s_loader_spark.publish.validate import TableChecks
from nycdb_k8s_loader_spark.registry import (
    DatasetDef,
    SourceFile,
    TableDef,
)


def _s(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t) for n, t in fields])


_str = T.StringType()
_int = T.IntegerType()
_long = T.LongType()
_dbl = T.DoubleType()
_ts = T.TimestampType()
_bool = T.BooleanType()

# --- DOB (buildings) ---------------------------------------------------------

# full-width where the public data dictionary is commonly queried
# (round-5 rule from datasets.py: append past the historical prefix so
# positional CSV fixtures stay valid)
DOBJOBS_SCHEMA = _s(
    ("job", _long), ("doc", _int), ("borough", _str), ("bbl", _str),
    ("jobtype", _str), ("jobstatus", _str), ("latestactiondate", _ts),
    ("ownername", _str), ("existingdwellingunits", _int),
    ("proposeddwellingunits", _int),
    ("house", _str), ("streetname", _str), ("block", _str), ("lot", _str),
    ("bin", _str), ("jobstatusdescrp", _str), ("buildingtype", _str),
    ("communityboard", _str), ("landmarked", _str), ("otherdescription", _str),
    ("applicantfirstname", _str), ("applicantlastname", _str),
    ("applicantprofessionaltitle", _str), ("applicantlicense", _str),
    ("prefilingdate", _ts), ("fullypaid", _ts), ("approved", _ts),
    ("fullypermitted", _ts), ("initialcost", _dbl), ("totalestfee", _dbl),
    ("existingzoningsqft", _long), ("proposedzoningsqft", _long),
    ("enlargementsqfootage", _long), ("existingoccupancy", _str),
    ("proposedoccupancy", _str), ("existingnumstories", _int),
    ("proposednumstories", _int), ("existingheight", _int),
    ("proposedheight", _int), ("zoningdist1", _str),
    ("specialdistrict1", _str), ("ownertype", _str),
    ("nonprofit", _str), ("ownerbusinessname", _str),
    ("ownerhousestreet", _str), ("city", _str), ("state", _str),
    ("zip", _str), ("jobdescription", _str), ("dobrundate", _ts),
)

DOB_COMPLAINTS_SCHEMA = _s(
    ("complaintnumber", _long), ("status", _str), ("dateentered", _ts),
    ("bin", _str), ("complaintcategory", _str), ("unit", _str),
    ("dispositioncode", _str), ("dispositiondate", _ts),
    ("inspectiondate", _ts),
)

DOB_VIOLATIONS_SCHEMA = _s(
    ("isndobbisviol", _long), ("boro", _str), ("bin", _str), ("bbl", _str),
    ("issuedate", _ts), ("violationnumber", _str),
    ("violationtypecode", _str), ("violationcategory", _str),
    ("dispositiondate", _ts), ("description", _str),
    ("block", _str), ("lot", _str), ("housenumber", _str),
    ("street", _str), ("dispositioncomments", _str),
    ("devicenumber", _str), ("ecbnumber", _str), ("number", _str),
    ("violationtype", _str),
)

ECB_VIOLATIONS_SCHEMA = _s(
    ("isndobbisextract", _long), ("ecbviolationnumber", _str),
    ("ecbviolationstatus", _str), ("bin", _str), ("bbl", _str),
    ("issuedate", _ts), ("hearingdate", _ts), ("severity", _str),
    ("violationtype", _str), ("penalityimposed", _dbl),
    ("amountpaid", _dbl), ("balancedue", _dbl),
)

OATH_HEARINGS_SCHEMA = _s(
    ("ticketnumber", _str), ("violationdate", _ts),
    ("issuingagency", _str), ("respondentname", _str), ("bbl", _str),
    ("hearingdate", _ts), ("hearingresult", _str),
    ("totalviolationamount", _dbl), ("balancedue", _dbl),
)

DOB_CERTIFICATE_OCCUPANCY_SCHEMA = _s(
    ("jobnumber", _long), ("bin", _str), ("bbl", _str), ("borough", _str),
    ("issuedate", _ts), ("cofoissuancetype", _str),
    ("numberofdwellingunits", _int),
)

DOB_SAFETY_VIOLATIONS_SCHEMA = _s(
    ("violationnumber", _str), ("bin", _str), ("bbl", _str),
    ("issuedate", _ts), ("violationcategory", _str),
    ("violationtype", _str), ("description", _str),
)

# --- HPD (housing preservation) ----------------------------------------------

HPD_VACATEORDERS_SCHEMA = _s(
    ("buildingid", _int), ("registrationid", _int), ("borough", _str),
    ("bbl", _str), ("vacateordernumber", _long),
    ("primaryvacatereason", _str), ("vacatetype", _str),
    ("vacateeffectivedate", _ts), ("rescinddate", _ts),
    ("numberofvacatedunits", _int),
)

HPD_CONH_SCHEMA = _s(
    ("id", _int), ("buildingid", _int), ("bbl", _str), ("borough", _str),
    ("conhrecordtype", _str), ("streetaddress", _str),
    ("orderdate", _ts), ("expirationdate", _ts),
)

HPD_AEP_SCHEMA = _s(
    ("buildingid", _int), ("bbl", _str), ("boro", _str),
    ("aepstartdate", _ts), ("currentstatus", _str),
    ("dischargedate", _ts), ("ofopenviolations", _int),
    ("totalfeesassessed", _dbl),
)

HPD_UNDERLYING_CONDITIONS_SCHEMA = _s(
    ("buildingid", _int), ("bbl", _str), ("boro", _str),
    ("caseopendate", _ts), ("casestatus", _str), ("caseclosedate", _ts),
)

# hpd_charges is a MULTI-TABLE dataset in the reference registry
# (omo = open-market orders, hwo = handyman work orders) — it keeps
# the file→table mapping path honest alongside acris.
HPD_OMO_SCHEMA = _s(
    ("omoid", _int), ("omonumber", _str), ("buildingid", _int),
    ("bbl", _str), ("omocreatedate", _ts), ("omoawardamount", _dbl),
    ("omostatusreason", _str), ("omodescription", _str),
)

HPD_HWO_SCHEMA = _s(
    ("hwoid", _int), ("chargeid", _int), ("buildingid", _int),
    ("bbl", _str), ("hwocreatedate", _ts), ("chargeamount", _dbl),
    ("chargetype", _str),
)

HPD_AFFORDABLE_PRODUCTION_SCHEMA = _s(
    ("projectid", _int), ("projectname", _str), ("bbl", _str),
    ("projectstartdate", _ts), ("projectcompletiondate", _ts),
    ("extremelylowincomeunits", _int), ("verylowincomeunits", _int),
    ("lowincomeunits", _int), ("totalunits", _int),
)

HPD_LITIGATIONS_SCHEMA = _s(
    ("litigationid", _int), ("buildingid", _int), ("boro", _str),
    ("bbl", _str), ("casetype", _str), ("caseopendate", _ts),
    ("casestatus", _str), ("penalty", _dbl),
    ("findingofharassment", _str),
)

# hpd_ll44 (Local Law 44 subsidized-housing disclosures) is the
# reference registry's 3-table dataset: projects, buildings, and the
# tax-credit attributes per project.
HPD_LL44_PROJECTS_SCHEMA = _s(
    ("projectid", _int), ("projectname", _str),
    ("programgroup", _str), ("loantype", _str), ("closingdate", _ts),
)

HPD_LL44_BUILDINGS_SCHEMA = _s(
    ("buildingid", _int), ("projectid", _int), ("bbl", _str),
    ("bin", _str), ("postcode", _str),
)

HPD_LL44_TAX_CREDIT_SCHEMA = _s(
    ("taxcreditid", _int), ("projectid", _int), ("taxcreditname", _str),
    ("taxcreditallocationyear", _int),
)

# --- DOF (finance) -----------------------------------------------------------

DOF_SALES_SCHEMA = _s(
    ("borough", _str), ("neighborhood", _str),
    ("buildingclasscategory", _str), ("address", _str), ("bbl", _str),
    ("residentialunits", _int), ("totalunits", _int),
    ("saleprice", _dbl), ("saledate", _ts),
)

DOF_TAX_LIEN_SALE_LIST_SCHEMA = _s(
    ("bbl", _str), ("borough", _str), ("taxclasscode", _str),
    ("buildingclass", _str), ("housenumber", _str), ("streetname", _str),
    ("zipcode", _str), ("waterdebtonly", _bool), ("cycle", _str),
)

DOF_PROPERTY_VALUATION_SCHEMA = _s(
    ("bbl", _str), ("year", _str), ("curmkttot", _long),
    ("curavttot", _long), ("units", _int), ("yrbuilt", _int),
    ("bldgcl", _str), ("taxclass", _str),
)

# The two Excel-sourced datasets (reference load_dataset.py:280-303:
# dof_annual_sales loads yearly borough workbooks, dof_421a loads the
# 421a exemption workbook — both through xlrd there, through
# sources/readers.read_excel → sources/xlsx.py here).
DOF_ANNUAL_SALES_SCHEMA = _s(
    ("borough", _str), ("neighborhood", _str),
    ("buildingclasscategory", _str), ("address", _str), ("zipcode", _str),
    ("residentialunits", _int), ("totalunits", _int),
    ("saleprice", _dbl), ("saledate", _ts), ("bbl", _str),
)

DOF_421A_SCHEMA = _s(
    ("borough", _str), ("neighborhood", _str),
    ("buildingclasscategory", _str), ("address", _str), ("zipcode", _str),
    ("bbl", _str), ("year", _int),
)

# --- city planning / other agencies ------------------------------------------

# full-width (the public MapPLUTO data dictionary's commonly-queried
# surface; appended past the original 14 so positional CSV fixtures
# stay valid — the round-5 schema-fidelity rule from datasets.py)
PLUTO_LATEST_SCHEMA = _s(
    ("bbl", _str), ("borough", _str), ("block", _int), ("lot", _int),
    ("address", _str), ("zipcode", _str), ("unitsres", _int),
    ("unitstotal", _int), ("yearbuilt", _int), ("numfloors", _dbl),
    ("ownername", _str), ("bldgclass", _str), ("latitude", _dbl),
    ("longitude", _dbl),
    ("cd", _int), ("ct2010", _str), ("cb2010", _str),
    ("schooldist", _int), ("council", _int), ("firecomp", _str),
    ("policeprct", _int), ("healtharea", _int),
    ("sanitboro", _str), ("sanitdistrict", _int),
    ("zonedist1", _str), ("zonedist2", _str), ("overlay1", _str),
    ("spdist1", _str), ("ltdheight", _str), ("splitzone", _str),
    ("landuse", _str), ("easements", _int), ("ownertype", _str),
    ("lotarea", T.LongType()), ("bldgarea", T.LongType()),
    ("comarea", T.LongType()), ("resarea", T.LongType()),
    ("officearea", T.LongType()), ("retailarea", T.LongType()),
    ("garagearea", T.LongType()), ("strgearea", T.LongType()),
    ("factryarea", T.LongType()), ("otherarea", T.LongType()),
    ("areasource", _str), ("numbldgs", _int),
    ("lotfront", _dbl), ("lotdepth", _dbl),
    ("bldgfront", _dbl), ("bldgdepth", _dbl),
    ("ext", _str), ("proxcode", _str), ("irrlotcode", _str),
    ("lottype", _str), ("bsmtcode", _str),
    ("assessland", _dbl), ("assesstot", _dbl), ("exempttot", _dbl),
    ("yearalter1", _int), ("yearalter2", _int),
    ("histdist", _str), ("landmark", _str),
    ("builtfar", _dbl), ("residfar", _dbl), ("commfar", _dbl),
    ("facilfar", _dbl),
    ("borocode", _int), ("condono", _int), ("tract2010", _str),
    ("xcoord", _int), ("ycoord", _int), ("zonemap", _str),
    ("zmcode", _str), ("sanborn", _str), ("taxmap", _str),
    ("edesignum", _str), ("appbbl", _str), ("appdate", _str),
    ("plutomapid", _str), ("version", _str),
)

# pad is the reference registry's two-table dataset (address ranges +
# bbl↔bin map).
PAD_ADR_SCHEMA = _s(
    ("bin", _str), ("boro", _str), ("block", _int), ("lot", _int),
    ("bbl", _str), ("lhnd", _str), ("hhnd", _str), ("stname", _str),
    ("zipcode", _str),
)

PAD_BBL_SCHEMA = _s(
    ("bbl", _str), ("boro", _str), ("block", _int), ("lot", _int),
    ("billbbl", _str),
)

DCP_HOUSINGDB_SCHEMA = _s(
    ("jobnumber", _long), ("bbl", _str), ("jobtype", _str),
    ("residflag", _str), ("unitsnet", _int), ("completedate", _ts),
    ("jobstatus", _str),
)

SPECULATION_WATCH_LIST_SCHEMA = _s(
    ("bbl", _str), ("borough", _str), ("neighborhood", _str),
    ("datesold", _ts), ("price", _dbl), ("capitalizationrate", _dbl),
)

MARSHAL_EVICTIONS_SCHEMA = _s(
    ("courtindexnumber", _str), ("docketnumber", _str),
    ("evictionaddress", _str), ("evictionaptnum", _str),
    ("executeddate", _ts), ("marshalfirstname", _str),
    ("marshallastname", _str), ("residentialcommercialind", _str),
    ("borough", _str), ("evictionzip", _str), ("bbl", _str),
    ("ejectment", _str), ("evictionlegalpossession", _str),
    ("latitude", _dbl), ("longitude", _dbl),
    ("communityboard", _int), ("councildistrict", _int),
    ("censustract", _str), ("nta", _str),
)

EXECUTED_EVICTIONS_SCHEMA = _s(
    ("courtindexnumber", _str), ("docketnumber", _str),
    ("executeddate", _ts), ("marshalname", _str), ("borough", _str),
    ("bbl", _str),
)

DHS_DAILY_SHELTER_COUNT_SCHEMA = _s(
    ("dateofcensus", _ts), ("totaladultsinshelter", _int),
    ("totalchildreninshelter", _int), ("totalindividualsinshelter", _int),
    ("adultfamiliesinshelter", _int), ("familieswithchildreninshelter", _int),
)

DOHMH_RODENT_INSPECTIONS_SCHEMA = _s(
    ("inspectiontype", _str), ("jobticketorworkorderid", _long),
    ("bbl", _str), ("inspectiondate", _ts), ("result", _str),
    ("approveddate", _ts),
)

DOS_ACTIVE_CORPORATIONS_SCHEMA = _s(
    ("dosid", _long), ("currententityname", _str),
    ("initialdosfilingdate", _ts), ("county", _str),
    ("jurisdiction", _str), ("entitytype", _str),
)

# boundaries: the S6 shapefile dataset, attributes-only + WKT geometry
# strings (SURVEY §7 de-scope resolution — the analytic geo half lives
# in operators/geo.py; full geometry is the Sedona path).
BOUNDARIES_NTA_SCHEMA = _s(
    ("ntacode", _str), ("ntaname", _str), ("boroname", _str),
    ("borocode", _int), ("shape_area", _dbl), ("geom_wkt", _str),
)


#: dataset → table list for every single/multi-table CSV dataset.
CATALOG_TABLES: dict[str, list[TableDef]] = {
    "dobjobs": [TableDef("dobjobs", DOBJOBS_SCHEMA)],
    "dob_complaints": [TableDef("dob_complaints", DOB_COMPLAINTS_SCHEMA)],
    "dob_violations": [TableDef("dob_violations", DOB_VIOLATIONS_SCHEMA)],
    "ecb_violations": [TableDef("ecb_violations", ECB_VIOLATIONS_SCHEMA)],
    "oath_hearings": [TableDef("oath_hearings", OATH_HEARINGS_SCHEMA)],
    "dob_certificate_occupancy": [
        TableDef(
            "dob_certificate_occupancy", DOB_CERTIFICATE_OCCUPANCY_SCHEMA
        )
    ],
    "dob_safety_violations": [
        TableDef("dob_safety_violations", DOB_SAFETY_VIOLATIONS_SCHEMA)
    ],
    "hpd_vacateorders": [
        TableDef("hpd_vacateorders", HPD_VACATEORDERS_SCHEMA)
    ],
    "hpd_conh": [TableDef("hpd_conh", HPD_CONH_SCHEMA)],
    "hpd_aep": [TableDef("hpd_aep", HPD_AEP_SCHEMA)],
    "hpd_underlying_conditions": [
        TableDef(
            "hpd_underlying_conditions", HPD_UNDERLYING_CONDITIONS_SCHEMA
        )
    ],
    "hpd_charges": [
        TableDef("hpd_omo", HPD_OMO_SCHEMA, files=["hpd_omo.csv"]),
        TableDef("hpd_hwo", HPD_HWO_SCHEMA, files=["hpd_hwo.csv"]),
    ],
    "hpd_affordable_production": [
        TableDef(
            "hpd_affordable_production", HPD_AFFORDABLE_PRODUCTION_SCHEMA
        )
    ],
    "hpd_litigations": [
        TableDef("hpd_litigations", HPD_LITIGATIONS_SCHEMA)
    ],
    "hpd_ll44": [
        TableDef(
            "hpd_ll44_projects", HPD_LL44_PROJECTS_SCHEMA,
            files=["hpd_ll44_projects.csv"],
        ),
        TableDef(
            "hpd_ll44_buildings", HPD_LL44_BUILDINGS_SCHEMA,
            files=["hpd_ll44_buildings.csv"],
        ),
        TableDef(
            "hpd_ll44_tax_credit", HPD_LL44_TAX_CREDIT_SCHEMA,
            files=["hpd_ll44_tax_credit.csv"],
        ),
    ],
    "dof_sales": [TableDef("dof_sales", DOF_SALES_SCHEMA)],
    "dof_tax_lien_sale_list": [
        TableDef("dof_tax_lien_sale_list", DOF_TAX_LIEN_SALE_LIST_SCHEMA)
    ],
    "dof_property_valuation_and_assessments": [
        TableDef(
            "dof_property_valuation_and_assessments",
            DOF_PROPERTY_VALUATION_SCHEMA,
        )
    ],
    "pluto_latest": [
        TableDef(
            "pluto_latest", PLUTO_LATEST_SCHEMA,
            # the city's parcel spine: one row per bbl, never NULL
            checks=TableChecks(unique_key=["bbl"], not_null=["bbl"]),
        )
    ],
    "pad": [
        TableDef("pad_adr", PAD_ADR_SCHEMA, files=["pad_adr.csv"]),
        TableDef("pad_bbl", PAD_BBL_SCHEMA, files=["pad_bbl.csv"]),
    ],
    "dcp_housingdb": [TableDef("dcp_housingdb", DCP_HOUSINGDB_SCHEMA)],
    "speculation_watch_list": [
        TableDef("speculation_watch_list", SPECULATION_WATCH_LIST_SCHEMA)
    ],
    "marshal_evictions": [
        TableDef("marshal_evictions", MARSHAL_EVICTIONS_SCHEMA)
    ],
    "executed_evictions": [
        TableDef("executed_evictions", EXECUTED_EVICTIONS_SCHEMA)
    ],
    "dhs_daily_shelter_count": [
        TableDef("dhs_daily_shelter_count", DHS_DAILY_SHELTER_COUNT_SCHEMA)
    ],
    "dohmh_rodent_inspections": [
        TableDef(
            "dohmh_rodent_inspections", DOHMH_RODENT_INSPECTIONS_SCHEMA
        )
    ],
    "dos_active_corporations": [
        TableDef(
            "dos_active_corporations", DOS_ACTIVE_CORPORATIONS_SCHEMA
        )
    ],
    # the reference's actual boundaries source is a ZIPPED SHAPEFILE
    # (tests/test_load_dataset.py:46-51, loaded via shp2pgsql there);
    # sources/shapefile.py parses .shp/.dbf with stdlib struct and
    # emits the same attributes + geom_wkt rows this schema declares.
    "boundaries": [
        TableDef(
            "nta_boundaries", BOUNDARIES_NTA_SCHEMA,
            files=["nta_boundaries.zip"],
        )
    ],
}


def catalog_defs() -> list[DatasetDef]:
    """DatasetDefs for the remaining scheduled surface. CSV datasets
    derive one source file per table (multi-table defs map file→table
    explicitly); the two DOF Excel datasets declare format="excel" and
    flow through read_excel inside the same Engine.load path."""
    out: list[DatasetDef] = []
    for name, tables in CATALOG_TABLES.items():
        files = []
        for t in tables:
            dests = t.files if t.files is not None else [f"{t.name}.csv"]
            for d in dests:
                files.append(
                    SourceFile(
                        url=f"https://data.cityofnewyork.us/mirror/{d}",
                        dest=d,
                        format="shapefile" if d.endswith(".zip") else "csv",
                    )
                )
        out.append(
            DatasetDef(name=name, files=files, tables=tables, schedule=name)
        )
    # dof_annual_sales: one table fed by MULTIPLE yearly workbooks
    # (reference test data: 2020_manhattan.xlsx + 2015_manhattan.xls;
    # both declared xlsx here — the stdlib reader takes zip containers,
    # legacy BIFF .xls converts upstream, sources/xlsx.py:17-19).
    out.append(
        DatasetDef(
            name="dof_annual_sales",
            files=[
                SourceFile(
                    url="https://www.nyc.gov/assets/finance/downloads/"
                        "annualized-sales/2020_manhattan.xlsx",
                    dest="dof_annual_sales_2020_manhattan.xlsx",
                    format="excel",
                ),
                SourceFile(
                    url="https://www.nyc.gov/assets/finance/downloads/"
                        "annualized-sales/2015_manhattan.xlsx",
                    dest="dof_annual_sales_2015_manhattan.xlsx",
                    format="excel",
                ),
            ],
            tables=[
                TableDef(
                    "dof_annual_sales", DOF_ANNUAL_SALES_SCHEMA,
                    # both yearly workbooks must contribute rows
                    checks=TableChecks(not_null=["bbl"], min_rows=2),
                )
            ],
        )
    )
    out.append(
        DatasetDef(
            name="dof_421a",
            files=[
                SourceFile(
                    url="https://www.nyc.gov/assets/finance/downloads/"
                        "421a_2021_brooklyn.xlsx",
                    dest="421a_2021_brooklyn.xlsx",
                    format="excel",
                ),
            ],
            tables=[TableDef("dof_421a", DOF_421A_SCHEMA)],
        )
    )
    return out
