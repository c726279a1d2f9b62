-- WOW post-SQL: the wow_bldgs rollup.
--
-- Capability twin of who-owns-what's wow_post_sql (the reference's
-- marquee table, same shape as tests/sql/wow_2021_create_bldgs_table
-- .sql: deeds CTE → DISTINCT ON latest sale, filtered violation /
-- complaint counts, rentstab coalesces, left-join pipeline onto the
-- registrations spine). Postgres dialect throughout — the engine
-- transpiles per statement (:: casts, = any lists, FILTER clauses,
-- DISTINCT ON → ranked-window rewrite).
--
-- Runs AFTER build_wow's Python steps, so wow_landlords /
-- wow_portfolios resolve from the staging namespace.

-- deeds: priced DEED-ish documents joined to their lots
-- (wow_2021_create_bldgs_table.sql:6-15).
CREATE TABLE wow_deeds AS
SELECT
    l.bbl,
    m.documentid,
    coalesce(m.docdate, m.recordedfiled) AS docdate,
    m.docamount::double AS docamount
FROM real_property_master m
JOIN real_property_legals l ON m.documentid = l.documentid
WHERE m.docamount > 1 AND m.doctype = any('{DEED,DEEDO}');

-- latest sale per lot: DISTINCT ON with a deterministic tiebreak
-- (wow_2021 sql:17-26 uses a pre-sorted CTE + first(); the transpiler
-- rewrites this to a ranked window).
-- Tiebreak discipline: (docdate, documentid, docamount) — docamount
-- included because ACRIS-style feeds carry duplicate document ids
-- (cf. (l_orderkey, l_linenumber) is NOT unique in the synthetic
-- twin); with all three keys, tied rows are identical in every
-- projected column, so the pick is deterministic cross-engine.
CREATE TABLE wow_lastsale AS
SELECT DISTINCT ON (bbl)
    bbl,
    documentid AS lastsale_docid,
    docdate AS lastsale_date,
    docamount AS lastsale_amount
FROM wow_deeds
ORDER BY bbl, docdate DESC, documentid DESC, docamount DESC;

-- filtered violation counts (wow_2021 sql:68-80 shape; count FILTER is
-- already BIGINT in both dialects, so no cast at the FILTER position).
CREATE TABLE wow_viol AS
SELECT
    bbl,
    count(*) AS total_violations,
    count(*) FILTER (WHERE class = 'A') AS classa_violations,
    count(*) FILTER (WHERE class = 'B') AS classb_violations,
    count(*) FILTER (WHERE class = 'C') AS classc_violations,
    count(*) FILTER (WHERE currentstatus = 'Open') AS open_violations,
    count(*) FILTER (WHERE inspectiondate >= '1997-06-01'::timestamp)
        AS recent_violations
FROM hpd_violations
GROUP BY bbl;

-- complaint counts (wow_2021 sql:40-66 shape, sans the json rollup —
-- that surface is exercised by q12/flagship).
CREATE TABLE wow_comp AS
SELECT
    bbl,
    count(*) AS total_complaints,
    count(*) FILTER (WHERE receiveddate >= '1997-06-01'::timestamp)
        AS recent_complaints
FROM hpd_complaints
GROUP BY bbl;

-- one owner name per lot (min() = deterministic pick, SURVEY §2 D1
-- discipline where the reference leans on unordered DISTINCT ON).
CREATE TABLE wow_regowners AS
SELECT bbl, min(name) AS ownername
FROM wow_landlords
GROUP BY bbl;

-- the marquee table: registrations spine + aggregate dims
-- (wow_2021 sql:89-125's 7-way left-join pipeline).
CREATE TABLE wow_bldgs AS
SELECT
    r.bbl,
    r.boro,
    o.ownername,
    p.portfolio_id,
    coalesce(v.total_violations, 0)::bigint AS total_violations,
    coalesce(v.classa_violations, 0)::bigint AS classa_violations,
    coalesce(v.classb_violations, 0)::bigint AS classb_violations,
    coalesce(v.classc_violations, 0)::bigint AS classc_violations,
    coalesce(v.open_violations, 0)::bigint AS open_violations,
    coalesce(v.recent_violations, 0)::bigint AS recent_violations,
    coalesce(cp.total_complaints, 0)::bigint AS total_complaints,
    coalesce(cp.recent_complaints, 0)::bigint AS recent_complaints,
    s.lastsale_docid,
    s.lastsale_date,
    s.lastsale_amount,
    coalesce(rs.unitsstab2007, 0)::int AS rsunits2007,
    coalesce(rs.uc2021, 0)::int AS rsunitslatest
FROM hpd_registrations r
LEFT JOIN wow_regowners o ON r.bbl = o.bbl
LEFT JOIN wow_portfolios p ON o.ownername = p.name
LEFT JOIN wow_viol v ON r.bbl = v.bbl
LEFT JOIN wow_comp cp ON r.bbl = cp.bbl
LEFT JOIN wow_lastsale s ON r.bbl = s.bbl
LEFT JOIN rentstab_summary rs ON r.bbl = rs.ucbbl;

-- function re-created post-publish (reference wowutil.py:170-181
-- re-runs CREATE FUNCTION in the wow schema after the swap; the
-- engine collects function DDL per statement and replays it).
CREATE OR REPLACE TEMPORARY FUNCTION wow_normalize_name(s STRING)
RETURNS STRING RETURN trim(regexp_replace(upper(s), '[^A-Z0-9]+', ' '));
