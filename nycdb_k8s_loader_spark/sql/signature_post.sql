-- Signature post-SQL: dashboard tables (capability twin of the
-- reference's signature_post_sql run by signatureutil.py:52-71 via
-- signature.table — S3-sourced UNHP building/loan tables joined with
-- the hpd dependency surface into building/collection rollups and
-- chart series).

-- latest loan status per building (DISTINCT ON, deterministic
-- (date, label) tiebreak) — staging scaffold, not published.
CREATE TABLE signature_loan_status_latest AS
SELECT DISTINCT ON (bbl)
    bbl, status AS latest_status, date AS latest_status_date
FROM signature_unhp_loan_status
ORDER BY bbl, date DESC, label DESC;

CREATE TABLE signature_buildings AS
SELECT
    b.bbl,
    b.loan_pool,
    b.landlord,
    b.bip::int AS bip,
    b.water_charges::double AS water_charges,
    b.origination_date,
    b.debt_total::double AS debt_total,
    s.latest_status,
    s.latest_status_date,
    coalesce(v.total_violations, 0) AS total_violations,
    coalesce(v.open_violations, 0) AS open_violations
FROM signature_unhp_buildings b
LEFT JOIN signature_loan_status_latest s ON b.bbl = s.bbl
LEFT JOIN (
    SELECT bbl,
           count(*) AS total_violations,
           count(*) FILTER (WHERE currentstatus = 'Open') AS open_violations
    FROM hpd_violations
    GROUP BY bbl
) v ON b.bbl = v.bbl;

CREATE TABLE signature_collections AS
SELECT
    loan_pool,
    count(*) AS n_bldgs,
    sum(debt_total)::double AS debt_total,
    sum(bip)::bigint AS bip_total,
    sum(water_charges)::double AS water_charges_total
FROM signature_buildings
GROUP BY loan_pool;

CREATE TABLE signature_building_charts AS
SELECT v.bbl, v.class, count(*) AS n_violations
FROM hpd_violations v
JOIN signature_unhp_buildings b ON v.bbl = b.bbl
GROUP BY v.bbl, v.class;

CREATE TABLE signature_collection_charts AS
SELECT b.loan_pool, v.class, count(*) AS n_violations
FROM hpd_violations v
JOIN signature_unhp_buildings b ON v.bbl = b.bbl
GROUP BY b.loan_pool, v.class;
