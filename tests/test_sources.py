"""Source-reader tests (S4/S7/S8): non-local Hadoop-FS URI scans and
the S3 fetch dispatch seam."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from nycdb_k8s_loader_spark.sources.readers import (
    fetch_to_landing,
    read_csv,
)

SCHEMA = T.StructType(
    [
        T.StructField("bbl", T.StringType()),
        T.StructField("units", T.IntegerType()),
    ]
)


class TestNonLocalUriScan:
    def test_read_csv_accepts_hadoop_fs_uris(self, spark, tmp_path):
        """S7's scan half: the typed CSV reader must resolve scheme-
        qualified URIs through the Hadoop FS layer (file:// here —
        s3a:// is the same code path with the connector jars on the
        classpath), not assume bare local paths."""
        p = tmp_path / "bldgs.csv"
        p.write_text("bbl,units\n1000010001,10\n2000020002,5\n")
        df = read_csv(spark, f"file://{p}", SCHEMA)
        assert df.count() == 2
        # and a mixed local+URI multi-file scan unions at scan time
        p2 = tmp_path / "more.csv"
        p2.write_text("bbl,units\n3000030003,7\n")
        assert read_csv(spark, [f"file://{p}", str(p2)], SCHEMA).count() == 3


class FakeS3:
    def __init__(self):
        self.calls = []

    def download_file(self, bucket, key, dest):
        self.calls.append((bucket, key))
        with open(dest, "w") as f:
            f.write("bbl,units\n1000010001,10\n")


class TestS3Fetch:
    def test_s3_url_dispatches_to_client(self, tmp_path):
        s3 = FakeS3()
        dest = str(tmp_path / "oca.csv")
        fetch_to_landing(
            "s3://oca-data/public/oca_addresses.csv", dest, s3_client=s3
        )
        assert s3.calls == [("oca-data", "public/oca_addresses.csv")]
        assert open(dest).read().startswith("bbl,units")

    def test_missing_boto3_raises_at_the_seam(self, tmp_path):
        """No boto3 in this container: the s3:// path must fail loudly
        at the credential seam, not silently skip the download."""
        try:
            import boto3  # noqa: F401

            pytest.skip("boto3 present; the seam raise cannot trigger")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError, match="boto3"):
            fetch_to_landing("s3://bucket/key.csv", str(tmp_path / "x.csv"))