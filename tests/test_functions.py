"""Function-registry tests (U2/O2): SQL temp functions registered,
usable from SQL, and re-applicable (the after-publish re-registration
pattern)."""

from __future__ import annotations

from nycdb_k8s_loader_spark.functions.registry import default_registry


def test_registry_applies_and_reapplies(spark):
    reg = default_registry()
    applied = reg.apply(spark)
    assert set(applied) == {"trigram_similarity", "slugify", "ws_fingerprint"}

    row = spark.sql(
        "SELECT trigram_similarity('hello world', 'hello world') AS same, "
        "trigram_similarity('aaaa', 'zzzz') AS diff, "
        "slugify('  Hello  World ') AS slug, "
        "ws_fingerprint('a  b') AS fp1, ws_fingerprint(' a b ') AS fp2"
    ).collect()[0]
    assert row["same"] == 1.0
    assert row["diff"] == 0.0
    assert row["slug"] == "hello-world"
    assert row["fp1"] == row["fp2"]  # whitespace-normalized equal

    # idempotent re-application (post-publish pattern, O2)
    assert reg.apply(spark) == applied
    assert spark.sql("SELECT trigram_similarity('a','a') AS s").collect()[0]["s"] == 1.0


def test_sql_function_matches_column_function(spark):
    """The SQL temp function and the Column-API implementation agree."""
    from pyspark.sql import functions as F

    from nycdb_k8s_loader_spark.functions.text_similarity import trigram_similarity

    default_registry().apply(spark)
    df = spark.createDataFrame(
        [("acme holdings llc", "acme holding llc"), ("abc", "xyz")],
        "a string, b string",
    )
    df.createOrReplaceTempView("pairs_t")
    col_api = [
        r["s"]
        for r in df.select(F.round(trigram_similarity("a", "b"), 6).alias("s")).collect()
    ]
    sql_api = [
        r["s"]
        for r in spark.sql(
            "SELECT round(trigram_similarity(a, b), 6) AS s FROM pairs_t"
        ).collect()
    ]
    assert col_api == sql_api
