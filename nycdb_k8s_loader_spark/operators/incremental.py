"""Incremental aggregation: mergeable partial rollups.

The reference's freshness model is all-or-nothing — when a dataset's
ETag changes it reloads and recomputes *everything*
(/root/reference/load_dataset.py:352-367).  At 100 TB that's the one
pattern that cannot survive: a day's delta must not cost a full-corpus
re-aggregation.  The fix is the classic mergeable-state decomposition
(the same algebra behind Spark's own partial aggregation, materialized
views, and every streaming engine's state):

    rollup(base ∪ delta) == merge(rollup(base), rollup(delta))

which holds for any commutative-monoid measure.  We keep the partial
state in *decomposed* form — count, sum, min, max — and derive
non-mergeable measures (avg) only at finalize.  The published rollup
table then refreshes by aggregating the delta partition alone and
merging: O(delta + groups), never O(base).

This is engine machinery, not a Catalyst rewrite: Catalyst already
does partial aggregation *within* one job; this operator spans jobs —
yesterday's persisted state + today's delta.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Decomposed state columns for one measure `m`:
#   m_cnt (non-null count), m_sum, m_min, m_max
_STATE_SUFFIXES = ("cnt", "sum", "min", "max")


def partial_rollup(
    df: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Aggregate ``df`` into mergeable per-key state.

    One shuffle on ``keys``; every state column combines map-side
    (count/sum/min/max are all monoid folds), so the shuffle carries
    one partial row per (task, key).
    """
    aggs = [F.count("*").alias("n_rows")]
    for m in measures:
        aggs += [
            F.count(m).alias(f"{m}_cnt"),
            F.sum(m).alias(f"{m}_sum"),
            F.min(m).alias(f"{m}_min"),
            F.max(m).alias(f"{m}_max"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_rollups(
    states: list[DataFrame], keys: list[str], measures: list[str]
) -> DataFrame:
    """Merge any number of partial-rollup states into one.

    Union of state rows + one aggregation: counts and sums add, mins
    and maxes fold — the monoid merge.  Cost is O(total state rows),
    independent of the raw-data size the states summarize.
    """
    if not states:
        raise ValueError("merge_rollups needs at least one state")
    unioned = reduce(lambda a, b: a.unionByName(b), states)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"{m}_cnt").alias(f"{m}_cnt"),
            F.sum(f"{m}_sum").alias(f"{m}_sum"),
            F.min(f"{m}_min").alias(f"{m}_min"),
            F.max(f"{m}_max").alias(f"{m}_max"),
        ]
    return unioned.groupBy(*keys).agg(*aggs)


def finalize_rollup(
    state: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Derive the presentation measures from decomposed state:
    count, sum, min, max pass through; avg = sum/cnt (null for empty
    groups, matching SQL AVG over all-null input)."""
    cols = [F.col(k) for k in keys] + [F.col("n_rows")]
    for m in measures:
        cols += [
            F.col(f"{m}_sum").alias(f"{m}_sum"),
            F.col(f"{m}_min").alias(f"{m}_min"),
            F.col(f"{m}_max").alias(f"{m}_max"),
            F.when(
                F.col(f"{m}_cnt") > 0,
                F.col(f"{m}_sum") / F.col(f"{m}_cnt"),
            ).alias(f"{m}_avg"),
        ]
    return state.select(*cols)
