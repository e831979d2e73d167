"""S3A object-store conf plumbing (reference spark/jobs/pr-wallet-data-tf.py:7-16).

No MinIO in the container, so the contract under test is the plumbing:
``s3a_conf`` builds the exact connector settings the reference hand-carries,
and ``configure_s3a`` lands them in the live session's Hadoop configuration
(where every s3a:// FileSystem instance reads them from). ZoneStore is
path-scheme-agnostic, so a reachable endpoint is the only missing piece.
"""

from __future__ import annotations

from cyrela_etl_spark.sources.zones import configure_s3a, s3a_conf


def test_s3a_conf_shape():
    conf = s3a_conf("http://minio:9000", "ak", "sk")
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"


def test_configure_s3a_reaches_hadoop_conf(spark):
    configure_s3a(spark, s3a_conf("http://minio:9000", "ak", "sk"))
    hconf = spark._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://minio:9000"
    assert hconf.get("fs.s3a.access.key") == "ak"
    assert hconf.get("fs.s3a.path.style.access") == "true"
