"""S3/MinIO integration: mirrors the reference's object-store test
(tests/test_with_minio.rs:72-107 — register an S3 endpoint + creds,
then read parquet through it and assert a row count).

The real read requires the hadoop-aws S3AFileSystem on the Spark
classpath. This container ships pyspark without it (and has no network
to fetch it), so the integration test detects the missing class and
skips with that reason; in any deployment that adds hadoop-aws +
aws-sdk-bundle jars it runs for real: moto (a local in-process S3
server, installed here) serves the bucket, boto3 uploads the events
fixture, configure_s3a points the live session at the endpoint, and
the count must match the local file's.

What always runs: configure_s3a's config contract (the exact Hadoop
keys the reference sets in its object-store registration), and the
moto round-trip through boto3 proving the fixture upload path works.
"""

from __future__ import annotations

import socket
import threading

import pytest

from datafusion_uba_spark.session import configure_s3a

SF_DIR = "/root/testdata/sf0.001"


def _s3a_available(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.hadoop.fs.s3a.S3AFileSystem"
        )
        return True
    except Exception:
        return False


def test_configure_s3a_sets_hadoop_conf(spark):
    configure_s3a(
        spark, "http://127.0.0.1:9000", "ak", "sk", path_style_access=True
    )
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://127.0.0.1:9000"
    assert hconf.get("fs.s3a.access.key") == "ak"
    assert hconf.get("fs.s3a.secret.key") == "sk"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.impl") == "org.apache.hadoop.fs.s3a.S3AFileSystem"


@pytest.fixture(scope="module")
def moto_s3():
    """A live local S3 endpoint (moto server) with the events fixture
    uploaded, or a skip if moto isn't importable."""
    moto_server = pytest.importorskip("moto.server")
    boto3 = pytest.importorskip("boto3")

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    server = moto_server.ThreadedMotoServer(port=port, verbose=False)
    server.start()
    endpoint = f"http://127.0.0.1:{port}"
    s3 = boto3.client(
        "s3",
        endpoint_url=endpoint,
        aws_access_key_id="testing",
        aws_secret_access_key="testing",
        region_name="us-east-1",
    )
    s3.create_bucket(Bucket="uba-test")
    s3.upload_file(f"{SF_DIR}/events.parquet", "uba-test", "events.parquet")
    yield endpoint, s3
    server.stop()


def test_moto_round_trip(moto_s3):
    endpoint, s3 = moto_s3
    head = s3.head_object(Bucket="uba-test", Key="events.parquet")
    import os

    assert head["ContentLength"] == os.path.getsize(
        f"{SF_DIR}/events.parquet"
    )


def test_read_parquet_via_s3a(spark, moto_s3):
    if not _s3a_available(spark):
        pytest.skip(
            "hadoop-aws S3AFileSystem not on the Spark classpath (pyspark "
            "ships without it and this container has no network to add "
            "hadoop-aws + aws-sdk-bundle); test runs in deployments that "
            "vendor those jars"
        )
    endpoint, _ = moto_s3
    configure_s3a(spark, endpoint, "testing", "testing")
    got = spark.read.parquet("s3a://uba-test/events.parquet").count()
    want = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert got == want == 1000
