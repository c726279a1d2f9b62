-- Derived rollup attached to the hpd_registrations dataset, mirroring
-- the reference's dataset-attached SQL surface (the nycdb registry's
-- hpd_registrations scripts build a grouped-by-bbl table and the
-- get_corporate_owner_info_for_regid function; discovery of the
-- created tables by SQL parse is load_dataset.py:98-103).
-- Postgres dialect on purpose: the engine transpiles per statement.

CREATE TABLE hpd_registrations_grouped_by_bbl AS
SELECT bbl,
       count(*)::int AS n_registrations,
       max(registrationid)::int AS latest_registrationid
FROM hpd_registrations
GROUP BY bbl;
