"""Session-factory conf tests: object-store preset wiring."""

from __future__ import annotations

from elt_pipeline_for_venture_capital_business_with_airflow_pyspark_spark.session import (
    object_store_conf,
    suggest_shuffle_partitions,
)


def test_object_store_conf_explicit_args():
    conf = object_store_conf(
        endpoint="http://minio:9000",
        access_key="ak",
        secret_key="sk",
        path_style=True,
        ssl=False,
    )
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "sk"
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.connection.ssl.enabled"] == "false"
    assert conf["spark.hadoop.fs.s3a.impl"].endswith("S3AFileSystem")


def test_object_store_conf_env_fallback(monkeypatch):
    monkeypatch.setenv("S3_ENDPOINT_URL", "http://env-endpoint:9000")
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "env-ak")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "env-sk")
    conf = object_store_conf()
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://env-endpoint:9000"
    assert conf["spark.hadoop.fs.s3a.access.key"] == "env-ak"
    assert conf["spark.hadoop.fs.s3a.secret.key"] == "env-sk"


def test_object_store_conf_omits_empty(monkeypatch):
    for var in ("S3_ENDPOINT_URL", "AWS_ACCESS_KEY_ID", "AWS_SECRET_ACCESS_KEY"):
        monkeypatch.delenv(var, raising=False)
    conf = object_store_conf()
    assert "spark.hadoop.fs.s3a.endpoint" not in conf
    assert "spark.hadoop.fs.s3a.access.key" not in conf


def test_suggest_shuffle_partitions_scales_with_input():
    # 100 TB at 128 MB target on 4000 cores: ~800k partitions,
    # rounded to a multiple of the parallelism
    n = suggest_shuffle_partitions(100 * 1024**4, 128, parallelism=4000)
    assert n >= 800_000 and n % 4000 == 0
    # tiny input never goes below the parallelism
    assert suggest_shuffle_partitions(1, 128, parallelism=32) == 32
