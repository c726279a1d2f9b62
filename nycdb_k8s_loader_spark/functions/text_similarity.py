"""String-similarity functions (pg_trgm capability, SURVEY.md K8/F13).

The reference installs the ``pg_trgm`` Postgres extension for the WOW
landlord search (/root/reference/wowutil.py:68-71). Spark has no
trigram operator, so we build one from native array expressions —
JVM-side, codegen'd, no Python UDF in the hot path:

    trigrams(s)  = distinct 3-char substrings of '  ' || s || ' '
                   (pg_trgm-style padding)
    similarity   = |A ∩ B| / |A ∪ B|

``F.levenshtein`` is built-in and covers the edit-distance side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def trigrams(col: Column | str) -> Column:
    """Distinct character trigrams with pg_trgm-style padding."""
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit("  "), F.lower(F.trim(c)), F.lit(" "))
    idx = F.sequence(F.lit(1), F.length(padded) - 2)
    return F.array_distinct(F.transform(idx, lambda i: padded.substr(i, F.lit(3))))


def trigram_similarity(a: Column | str, b: Column | str) -> Column:
    """pg_trgm ``similarity(a, b)``: Jaccard over padded trigram sets."""
    ta, tb = trigrams(a), trigrams(b)
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def normalized_name(col: Column | str) -> Column:
    """Landlord-name standardization shape (reference: portfoliograph
    normalizes owner names before graph building, wowutil.py:74-85):
    uppercase, collapse non-alphanumerics, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.upper(c), r"[^A-Z0-9]+", " "))
