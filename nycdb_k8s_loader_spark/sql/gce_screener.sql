-- Good Cause Eviction post-SQL: eligibility screener (capability twin
-- of the reference's good_cause_sql run by goodcauseutil.py:40-51 via
-- goodcause.table — published INTO the wow schema like the reference,
-- goodcauseutil.py:36,69).
--
-- Resolution note: wow_bldgs resolves from the wow namespace via the
-- search path (the gce dataset declares depends_on=["wow"], so the
-- published table exists by the time this runs).

-- portfolio sizes — staging scaffold, not published.
CREATE TABLE gce_portfolio_sizes AS
SELECT portfolio_id, count(*) AS portfolio_bldgs
FROM wow_bldgs
WHERE portfolio_id IS NOT NULL
GROUP BY portfolio_id;

CREATE TABLE gce_screener AS
SELECT
    b.bbl,
    b.boro,
    b.ownername,
    b.portfolio_id,
    coalesce(p.portfolio_bldgs, 0)::int AS portfolio_bldgs,
    (b.rsunitslatest > 0) AS is_rent_stabilized,
    (b.rsunitslatest = 0 AND coalesce(p.portfolio_bldgs, 0) >= 10)
        AS gce_presumed_covered
FROM wow_bldgs b
LEFT JOIN gce_portfolio_sizes p ON b.portfolio_id = p.portfolio_id;
