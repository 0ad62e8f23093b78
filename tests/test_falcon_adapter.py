"""Adapter-layer contracts (SURVEY §2.1 R14, R17-R21) — pure logic over
injected I/O, no network."""

from __future__ import annotations

import pytest

from cses2humio_spark.sources.falcon_adapter import (
    StreamDescriptor,
    discover_streams,
    kafka_source_options,
    parse_stream_descriptor,
    partition_from_url,
    random_app_id,
    redact_config,
    refresh_due,
)


def _resource(partition=0, interval=1800, token="sek"):
    return {
        "dataFeedURL": f"https://feed.example/sensors/entities/datafeed/v1/{partition}",
        "sessionToken": {"token": token},
        "refreshActiveSessionInterval": interval,
    }


def test_partition_from_url():
    assert partition_from_url("https://x/feed/7") == 7
    assert partition_from_url("https://x/feed/3?appId=a&offset=9") == 3
    with pytest.raises(ValueError):
        partition_from_url("https://x/feed/latest")


def test_descriptor_refresh_at_85_percent():
    d = parse_stream_descriptor(_resource(partition=2, interval=1000), "app")
    assert d.partition == 2
    assert d.refresh_delta == 850.0  # 0.85 x interval (app.py:256 semantic)
    assert not refresh_due(started_at=0.0, desc=d, now=849.9)
    assert refresh_due(started_at=0.0, desc=d, now=850.0)


def test_discovery_retries_then_randomizes_app_id():
    calls = []

    def fetch(app_id):
        calls.append(app_id)
        # empty twice, then respond only to the randomized identity
        if len(calls) < 3:
            return []
        return [_resource(partition=0), _resource(partition=1)]

    descs = discover_streams(
        fetch,
        "stuck-app",
        retries_before_random=1,
        seed_fn=lambda: "rnd",
        sleep=lambda s: None,
    )
    assert [d.partition for d in descs] == [0, 1]
    assert calls[0] == "stuck-app"
    # fallback identity is padded to 31 chars
    assert len(calls[-1]) == 31 and calls[-1].startswith("rnd")


def test_discovery_partition_filter_and_exhaustion():
    descs = discover_streams(
        lambda a: [_resource(partition=0), _resource(partition=1)],
        "app",
        partition=1,
    )
    assert [d.partition for d in descs] == [1]
    assert (
        discover_streams(lambda a: [], "app", max_attempts=2, sleep=lambda s: None)
        == []
    )


def test_random_app_id_padding():
    assert len(random_app_id(lambda: "abc")) == 31
    assert len(random_app_id(lambda: "x" * 60)) == 31


def test_kafka_options_carry_token_as_sasl_secret():
    d = parse_stream_descriptor(_resource(token="tok123"), "app")
    opts = kafka_source_options(d, "broker:9092")
    assert opts["kafka.bootstrap.servers"] == "broker:9092"
    assert "tok123" in opts["kafka.sasl.jaas.config"]
    assert opts["subscribe"] == "falcon.app"


def test_redaction_masks_secrets_keeps_tail():
    cfg = {"falcon_api_secret": "supersecret", "humio_token": "t", "host": "h"}
    red = redact_config(cfg)
    assert red["falcon_api_secret"].endswith("et")
    assert set(red["falcon_api_secret"][:-2]) == {"*"}
    assert red["host"] == "h"
    assert "supersecret" not in str(red)


def test_descriptor_is_frozen():
    d = StreamDescriptor("u", "t", 10, "a", 0, 8.5)
    with pytest.raises(Exception):
        d.token = "x"  # type: ignore[misc]


def test_redaction_fully_masks_short_secrets():
    red = redact_config({"humio_token": "ab", "token": "abc"})
    assert red["humio_token"] == "**"
    assert red["token"] == "***"


def test_jaas_config_escapes_quotes_and_backslashes():
    d = parse_stream_descriptor(_resource(token='to"k\\en'), 'ap"p')
    jaas = kafka_source_options(d, "b:9092")["kafka.sasl.jaas.config"]
    assert 'password="to\\"k\\\\en"' in jaas
    assert 'username="ap\\"p"' in jaas
