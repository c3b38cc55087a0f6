"""S3A session-conf plumbing (SURVEY §2.10 D3; reference
oss_s3_server_side_logging_compacter.py:197-208).  No S3 or boto3 in
the container, so these cover construction + application — the exact
key/value surface a cluster deploy would carry."""

import pytest

from aws_logs_to_parquet_converter_spark.session import apply_s3a_conf, s3a_hadoop_conf


def test_explicit_keys_mirror_reference():
    conf = s3a_hadoop_conf(access_key="AKIAEXAMPLE", secret_key="s3cr3t", committer="v2")
    # the reference's three literal settings (compacter.py:197-208)
    assert conf["mapreduce.fileoutputcommitter.algorithm.version"] == "2"
    assert conf["fs.s3a.access.key"] == "AKIAEXAMPLE"
    assert conf["fs.s3a.secret.key"] == "s3cr3t"
    assert conf["fs.s3a.aws.credentials.provider"].endswith("SimpleAWSCredentialsProvider")


def test_session_token_selects_temporary_provider():
    conf = s3a_hadoop_conf(access_key="A", secret_key="B", session_token="T")
    assert conf["fs.s3a.session.token"] == "T"
    assert conf["fs.s3a.aws.credentials.provider"].endswith("TemporaryAWSCredentialsProvider")


def test_no_keys_uses_default_provider_chain():
    """Without explicit keys nothing credential-shaped is emitted — the
    default chain (instance profile / env) takes over, which is the
    posture that keeps secrets out of Spark UIs and event logs."""
    conf = s3a_hadoop_conf(region="us-west-2")
    assert not any(k.startswith("fs.s3a.access") or "secret" in k for k in conf)
    assert conf["fs.s3a.endpoint.region"] == "us-west-2"


def test_magic_committer_is_default():
    """The v2 rename committer the reference pinned is unsafe on S3's
    non-atomic rename; the default here must be the magic committer."""
    conf = s3a_hadoop_conf()
    assert conf["fs.s3a.committer.name"] == "magic"
    assert conf["fs.s3a.committer.magic.enabled"] == "true"
    assert "mapreduce.fileoutputcommitter.algorithm.version" not in conf


def test_unknown_committer_rejected():
    with pytest.raises(ValueError):
        s3a_hadoop_conf(committer="v1")


def test_apply_reaches_hadoop_configuration(spark):
    conf = s3a_hadoop_conf(
        access_key="AKIAEXAMPLE", secret_key="s3cr3t", endpoint="http://localhost:9000",
        committer="v2",
    )
    apply_s3a_conf(spark, conf)
    hc = spark._jsc.hadoopConfiguration()
    assert hc.get("fs.s3a.access.key") == "AKIAEXAMPLE"
    assert hc.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert hc.get("mapreduce.fileoutputcommitter.algorithm.version") == "2"
