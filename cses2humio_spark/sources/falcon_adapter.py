"""Source-adapter layer for the CrowdStrike-feed concerns that live OUTSIDE
the dataflow (SURVEY.md §2.1 R14, R17-R21; §7.6 — adapter stubs behind
interfaces, no network reimplementation).

Everything here is pure logic over injected I/O callables, so the contract
of each reference behavior is testable without Falcon/Humio credentials:

- R17 stream discovery with retry + randomized-app-id fallback
  (app.py:261-302, random_app_id app.py:30-35)
- R18 stream-descriptor normalization incl. the 85% session-refresh point
  (app.py:244-258, refresh factor app.py:256)
- R14 session keep-alive scheduling (app.py:84-90, 178-197) — the adapter
  computes WHEN; the actual refresh call is an injected callable
- R19 auth config surface → Kafka SASL options (the engine consumes the
  feed via Kafka in production; SURVEY §1.7)
- R21 secret redaction for config logging (app.py:379-391)
"""

from __future__ import annotations

import time as _time
from collections.abc import Callable, Iterable, Mapping
from dataclasses import dataclass

DEFAULT_REFRESH_FACTOR = 0.85  # reference refreshes at 85% of the session
APP_ID_PAD = 31  # randomized fallback app-ids are padded to 31 chars


def partition_from_url(url: str) -> int:
    """The partition id is the trailing path segment of the feed URL
    (reference semantic: app.py:61-62). Query strings are ignored."""
    path = url.split("?", 1)[0].rstrip("/")
    tail = path.rsplit("/", 1)[-1]
    if not tail.isdigit():
        raise ValueError(f"feed URL has no trailing partition number: {url!r}")
    return int(tail)


@dataclass(frozen=True)
class StreamDescriptor:
    """Normalized stream resource (app.py:244-258): everything a consumer
    needs to open, authenticate, resume, and keep alive one partition."""

    url: str
    token: str
    refresh_interval: int
    app_id: str
    partition: int
    refresh_delta: float  # seconds until proactive session refresh

    @property
    def refresh_deadline(self) -> float:
        return self.refresh_delta


def parse_stream_descriptor(
    resource: Mapping, app_id: str, refresh_factor: float = DEFAULT_REFRESH_FACTOR
) -> StreamDescriptor:
    """Normalize one discovery-response resource into a StreamDescriptor.
    ``refresh_delta = refresh_factor * refreshActiveSessionInterval`` — the
    proactive keep-alive point (refresh *before* expiry, not on failure)."""
    url = resource["dataFeedURL"]
    interval = int(resource.get("refreshActiveSessionInterval", 1800))
    return StreamDescriptor(
        url=url,
        token=resource["sessionToken"]["token"],
        refresh_interval=interval,
        app_id=app_id,
        partition=partition_from_url(url),
        refresh_delta=refresh_factor * interval,
    )


def random_app_id(seed_fn: Callable[[], str], pad: int = APP_ID_PAD) -> str:
    """Fallback app-id for stuck discovery (app.py:30-35 semantic): a fresh
    random identity, padded/truncated to ``pad`` chars so the service
    accepts it. ``seed_fn`` is injected for determinism in tests."""
    raw = seed_fn()
    return (raw + "x" * pad)[:pad]


def discover_streams(
    fetch: Callable[[str], Iterable[Mapping]],
    app_id: str,
    partition: int = -1,
    retries_before_random: int = 1,
    retry_wait: float = 0.0,
    max_attempts: int = 5,
    seed_fn: Callable[[], str] | None = None,
    sleep: Callable[[float], None] = _time.sleep,
) -> list[StreamDescriptor]:
    """R17 discovery loop: call ``fetch(app_id)``; on an empty response,
    retry after ``retry_wait``; after ``retries_before_random`` empty
    rounds, switch to a randomized app-id (the reference's recovery for a
    stuck registration). ``partition >= 0`` filters to one partition.

    ``fetch`` is the injected network boundary — the engine never opens the
    HTTP connection itself (SURVEY §7.6)."""
    current = app_id
    for attempt in range(max_attempts):
        resources = list(fetch(current))
        if resources:
            descs = [parse_stream_descriptor(r, current) for r in resources]
            if partition >= 0:
                descs = [d for d in descs if d.partition == partition]
            return descs
        if attempt + 1 >= retries_before_random and seed_fn is not None:
            current = random_app_id(seed_fn)
        if retry_wait:
            sleep(retry_wait)
    return []


def refresh_due(
    started_at: float, desc: StreamDescriptor, now: float
) -> bool:
    """R14: the session must be refreshed once ``refresh_delta`` seconds
    have elapsed — BEFORE the interval expires."""
    return (now - started_at) >= desc.refresh_delta


def kafka_source_options(
    desc: StreamDescriptor, bootstrap_servers: str, topic_prefix: str = "falcon"
) -> dict[str, str]:
    """R19: map a stream descriptor onto Kafka source options (the
    production ingestion path, SURVEY §1.7). The session token becomes the
    SASL secret; one topic partition per stream partition."""
    def _jaas_escape(s: str) -> str:
        # JAAS string values: backslash then double quote must be escaped
        return s.replace("\\", "\\\\").replace('"', '\\"')

    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": f"{topic_prefix}.{desc.app_id}",
        "startingOffsets": "earliest",
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "PLAIN",
        "kafka.sasl.jaas.config": (
            "org.apache.kafka.common.security.plain.PlainLoginModule required "
            f'username="{_jaas_escape(desc.app_id)}" '
            f'password="{_jaas_escape(desc.token)}";'
        ),
    }


def redact_config(
    cfg: Mapping[str, object],
    secret_keys: Iterable[str] = ("falcon_api_secret", "humio_token", "token"),
) -> dict[str, object]:
    """R21: config echo with secrets masked (app.py:379-391 semantic).
    Values keep their last 2 chars so operators can tell keys apart."""
    secrets = set(secret_keys)
    out: dict[str, object] = {}
    for k, v in cfg.items():
        if k in secrets and isinstance(v, str) and v:
            # short secrets are masked entirely — keeping a 2-char tail of a
            # 2-3 char value would leak most or all of it
            out[k] = "*" * len(v) if len(v) <= 4 else "*" * (len(v) - 2) + v[-2:]
        else:
            out[k] = v
    return out
