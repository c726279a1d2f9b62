"""Shared driver-side fixture materialization.

Three catalog entries synthesize SOURCE FILES from the parquet tables
so an engine pipeline can "download" them (w01's CSV closure, w02's
xlsx workbooks, st10's streaming drops). Building a local file
genuinely needs the driver, so each used to carry its own
``toPandas()`` call — this helper is the fence the round-4 verdict
asked for once the pattern appeared a third time: ONE stringification
rule (timestamps as ISO-T — the CSV/xlsx readers' parse format — and
NULLs as empty fields, so pandas never promotes nullable ints to
'10.0' floats that a typed scan rejects) and ONE hard size guard, so
no fixture generator can silently grow into a corpus-scale collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixture generators are sf-dir-sized (≤ ~1M rows at the bench sf).
#: Anything bigger is a bug — a data-scale collect hiding in a plan.
MAX_FIXTURE_ROWS = 2_000_000


def collect_fixture_pdf(df: DataFrame, max_rows: int = MAX_FIXTURE_ROWS):
    """Stringify ``df`` driver-side for fixture writing: timestamps →
    ISO-T seconds, everything else → its string cast (NULL stays NULL
    → empty CSV field). Raises if the frame exceeds ``max_rows``."""
    cols = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.dataType.typeName() == "timestamp":
            cols.append(
                F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss").alias(f.name)
            )
        else:
            cols.append(c.cast("string").alias(f.name))
    out = df.select(*cols)
    n = out.count()
    if n > max_rows:
        raise ValueError(
            f"fixture generator asked to collect {n} rows "
            f"(> {max_rows}); fixture frames must stay driver-sized"
        )
    return out.toPandas()
