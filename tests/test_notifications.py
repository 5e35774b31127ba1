"""K5/F7 SNS notifications and S11 secret interpolation — pure
config/data-plane units, no Spark session needed."""

from __future__ import annotations

import json

import pytest


def test_template_render_variables_and_if_block():
    from kafka_overwatch_spark.sinks.notifications import (
        EMAIL_TEMPLATE,
        render_usage_report_message,
    )

    with_signed = render_usage_report_message(
        EMAIL_TEMPLATE,
        "primary",
        s3_url="https://bucket/report.json",
        s3_signed_url="https://bucket/report.json?sig=abc",
    )
    assert "cluster primary" in with_signed
    assert "Signed link: https://bucket/report.json?sig=abc" in with_signed
    without = render_usage_report_message(
        EMAIL_TEMPLATE, "primary", s3_url="https://bucket/report.json"
    )
    assert "Signed link" not in without
    assert "{{" not in without and "{%" not in without


def test_default_template_is_valid_json():
    from kafka_overwatch_spark.sinks.notifications import (
        DEFAULT_TEMPLATE,
        render_usage_report_message,
    )

    body = render_usage_report_message(
        DEFAULT_TEMPLATE, "analytics", s3_url="s3://b/r.json"
    )
    assert json.loads(body) == {
        "kafka_cluster": "analytics",
        "usage_s3_url": "s3://b/r.json",
    }


def test_channel_publishes_json_structure_message():
    from kafka_overwatch_spark.sinks.notifications import SnsChannel

    sent = []
    ch = SnsChannel(
        "reports",
        topic_arn="arn:aws:sns:eu-west-1:000000000000:overwatch",
        publisher=sent.append,
    )
    req = ch.send_usage_report_notification(
        "primary", subject="Kafka Overwatch usage report",
        s3_url="https://bucket/report.json",
    )
    assert sent == [req]
    assert req["TopicArn"].endswith(":overwatch")
    assert req["MessageStructure"] == "json"
    messages = json.loads(req["Message"])
    assert set(messages) == {"default", "email"}
    # str message → plain publish, no MessageStructure
    from kafka_overwatch_spark.sinks.notifications import build_publish_request

    plain = build_publish_request("arn:x", "subj", "hello")
    assert "MessageStructure" not in plain and plain["Message"] == "hello"
    with pytest.raises(TypeError):
        build_publish_request("arn:x", "subj", 42)


def test_render_error_policy():
    from kafka_overwatch_spark.sinks.notifications import SnsChannel

    class Boom(str):
        def __str__(self):  # pragma: no cover - repr only
            raise RuntimeError("boom")

    # a template rendering failure raises unless ignore_errors
    bad = {"default": "{{ KAFKA_CLUSTER_ID }}"}
    ch = SnsChannel("c", "arn:x", templates=bad, ignore_errors=True)
    req = ch.send_usage_report_notification(Boom(), subject="s")
    assert json.loads(req["Message"]) == {}
    ch_strict = SnsChannel("c", "arn:x", templates=bad, ignore_errors=False)
    with pytest.raises(RuntimeError):
        ch_strict.send_usage_report_notification(Boom(), subject="s")


def test_parse_resolve_string():
    from kafka_overwatch_spark.secrets import parse_resolve_string

    assert parse_resolve_string(
        "{{resolve:secretsmanager:kafka/creds:SecretString:password:v2}}"
    ) == ("kafka/creds", "password", "v2")
    assert parse_resolve_string(
        "{{resolve:secretsmanager:kafka/creds}}"
    ) == ("kafka/creds", None, None)
    for bad in (
        "plain-value",
        "{{resolve:ssm:param}}",
        "{{resolve:secretsmanager:name:OtherField:k}}",
    ):
        with pytest.raises(ValueError):
            parse_resolve_string(bad)


def test_resolve_client_config_and_fallback():
    from kafka_overwatch_spark.secrets import (
        dict_fetcher,
        resolve_client_config,
    )

    fetch = dict_fetcher(
        {"kafka/creds": {"username": "svc", "password": "hunter2"}}
    )
    cfg = {
        "bootstrap.servers": "broker:9092",
        "sasl.username": (
            "{{resolve:secretsmanager:kafka/creds:SecretString:username}}"
        ),
        "sasl.password": (
            "{{resolve:secretsmanager:kafka/creds:SecretString:password}}"
        ),
        "ssl.keystore.password": (
            "{{resolve:secretsmanager:missing:SecretString:k}}"
        ),
    }
    out = resolve_client_config(cfg, fetch)
    assert out["sasl.username"] == "svc"
    assert out["sasl.password"] == "hunter2"
    assert out["bootstrap.servers"] == "broker:9092"
    # failed resolution keeps the raw value (reference fallback) and the
    # input dict is untouched
    assert out["ssl.keystore.password"].startswith("{{resolve:")
    assert cfg["sasl.username"].startswith("{{resolve:")


def test_load_config_interpolates_kafka_block(tmp_path):
    from kafka_overwatch_spark.config import load_config
    from kafka_overwatch_spark.secrets import dict_fetcher

    p = tmp_path / "overwatch.yaml"
    p.write_text(
        """
clusters:
  primary:
    kafka:
      bootstrap.servers: broker:9092
      sasl.password: "{{resolve:secretsmanager:kafka/creds:SecretString:pw}}"
"""
    )
    cfgs = load_config(
        str(p), secrets_fetcher=dict_fetcher({"kafka/creds": {"pw": "s3cret"}})
    )
    assert cfgs["primary"].kafka["sasl.password"] == "s3cret"
    # without a fetcher the raw reference is preserved
    cfgs2 = load_config(str(p))
    assert cfgs2["primary"].kafka["sasl.password"].startswith("{{resolve:")
