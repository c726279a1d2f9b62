-- OCA post-SQL: derived eviction rollups (capability twin of the
-- reference's oca_post_sql scripts run by ocautil.py:49-68 via
-- ocaevictions.table — monthly filing series + per-building rollup
-- over the S3-sourced address/index tables).

CREATE TABLE oca_evictions_monthly AS
SELECT
    date_trunc('month', i.fileddate) AS filed_month,
    a.boro,
    count(*) AS n_filings,
    count(DISTINCT a.bbl) AS n_bldgs
FROM oca_addresses_with_bbl a
JOIN oca_index i ON a.indexnumberid = i.indexnumberid
GROUP BY date_trunc('month', i.fileddate), a.boro;

CREATE TABLE oca_evictions_bldgs AS
SELECT
    bbl,
    max(unitsres)::int AS unitsres,
    count(DISTINCT indexnumberid) AS n_filings
FROM oca_addresses_with_bbl
GROUP BY bbl;
