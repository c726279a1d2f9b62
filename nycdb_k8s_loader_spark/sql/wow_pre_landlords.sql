-- WOW pre-SQL: raw landlord contact extraction.
--
-- Capability twin of who-owns-what's wow_pre_sql scripts (run by the
-- reference at /root/reference/wowutil.py:160-161 inside the temp
-- schema). Written in the Postgres dialect on purpose — the engine
-- transpiles each statement via publish/transpile.py (:: casts,
-- = any('{...}') lists), exactly the constructs the reference's SQL
-- relies on.
--
-- Owner-ish contact types only, with a usable name and address; the
-- Python step that follows (build_wow) normalizes names and builds the
-- portfolio graph from this table.
CREATE TABLE wow_landlords_base AS
SELECT
    c.registrationid::int AS registrationid,
    r.bbl,
    c.corporationname AS rawname,
    (c.businesshousenumber || ' ' || c.businessstreetname)::text AS bizaddr
FROM hpd_contacts c
JOIN hpd_registrations r ON c.registrationid = r.registrationid
WHERE c.type = any('{CorporateOwner,HeadOfficer,IndividualOwner}')
  AND c.corporationname IS NOT NULL
  AND c.businesshousenumber IS NOT NULL
  AND c.businessstreetname IS NOT NULL;
