"""R20 config surface (reference app.py:394-566): defaults < CLI flags <
env vars, with int/bool coercion and required-variable validation. These
tests pin the layering and specifically the coercion fix: the reference
lists ``bulk_max_size`` twice in its int tuple and OMITS
``flush_wait_time`` (app.py:545-552), so FLUSH_WAIT_TIME arrives as a
string there; here every int flag coerces.
"""

from __future__ import annotations

import pytest

from cses2humio_spark.cli import (
    AppConfig,
    MissingConfigError,
    resolve_config,
)

# Minimum env that satisfies required-variable validation.
REQ = {
    "FALCON_API_ID": "id123",
    "FALCON_API_SECRET": "supersecretvalue",
    "HUMIO_TOKEN": "tok456789",
}


def test_defaults_match_reference():
    cfg = resolve_config([], env=REQ)
    assert cfg.offset_file == "offset.db"
    assert cfg.falcon_url == "https://api.crowdstrike.com"
    assert cfg.humio_url == "https://cloud.humio.com"
    assert cfg.app_id == "cses2humio"
    assert cfg.bulk_max_size == 200
    assert cfg.flush_wait_time == 10
    assert cfg.stream_timeout == 60
    assert cfg.retry_timer == 300
    assert cfg.appid_random == 1
    assert cfg.keepalive == 10
    assert cfg.enrich is False and cfg.metadata is False
    assert cfg.verbose is False and cfg.exceptions is False


def test_cli_flags_override_defaults():
    cfg = resolve_config(
        ["--bulk-max-size", "50", "--enrich", "--app-id", "myapp"], env=REQ
    )
    assert cfg.bulk_max_size == 50
    assert cfg.enrich is True
    assert cfg.app_id == "myapp"


def test_env_overrides_cli():
    env = {**REQ, "BULK_MAX_SIZE": "75", "APP_ID": "envapp"}
    cfg = resolve_config(["--bulk-max-size", "50", "--app-id", "cliapp"], env=env)
    assert cfg.bulk_max_size == 75
    assert cfg.app_id == "envapp"


@pytest.mark.parametrize(
    "var,field",
    [
        ("BULK_MAX_SIZE", "bulk_max_size"),
        ("FLUSH_WAIT_TIME", "flush_wait_time"),  # the reference's missed flag
        ("STREAM_TIMEOUT", "stream_timeout"),
        ("RETRY_TIMER", "retry_timer"),
        ("APPID_RANDOM", "appid_random"),
        ("KEEPALIVE", "keepalive"),
    ],
)
def test_every_int_flag_coerces_from_env(var, field):
    cfg = resolve_config([], env={**REQ, var: "42"})
    assert getattr(cfg, field) == 42
    assert isinstance(getattr(cfg, field), int)


@pytest.mark.parametrize(
    "var,field",
    [
        ("VERBOSE", "verbose"),
        ("ENRICH", "enrich"),
        ("METADATA", "metadata"),
        ("EXCEPTIONS", "exceptions"),
    ],
)
@pytest.mark.parametrize(
    "raw,expected",
    [("true", True), ("1", True), ("t", True), ("TRUE", True),
     ("false", False), ("0", False), ("no", False)],
)
def test_every_bool_flag_coerces_from_env(var, field, raw, expected):
    cfg = resolve_config([], env={**REQ, var: raw})
    assert getattr(cfg, field) is expected


def test_bad_int_env_is_a_loud_error():
    with pytest.raises(ValueError, match="BULK_MAX_SIZE"):
        resolve_config([], env={**REQ, "BULK_MAX_SIZE": "lots"})


def test_bad_bool_env_is_a_loud_error():
    # a typo must not silently coerce to False (matches the int contract)
    with pytest.raises(ValueError, match="ENRICH"):
        resolve_config([], env={**REQ, "ENRICH": "enabled"})


def test_empty_env_override_is_a_loud_error():
    # set-but-empty is invalid, not a silent fallback to the CLI/default —
    # and for required vars it must NOT be reported as merely missing
    with pytest.raises(ValueError, match="BULK_MAX_SIZE"):
        resolve_config([], env={**REQ, "BULK_MAX_SIZE": ""})
    with pytest.raises(ValueError, match="FALCON_API_ID"):
        resolve_config([], env={**REQ, "FALCON_API_ID": ""})


def test_missing_required_vars_named_and_exit_code_1():
    with pytest.raises(MissingConfigError) as ei:
        resolve_config([], env={"FALCON_API_ID": "id"})
    assert ei.value.code == 1
    assert set(ei.value.missing) == {"FALCON_API_SECRET", "HUMIO_TOKEN"}


def test_required_satisfiable_via_cli_alone():
    cfg = resolve_config(
        [
            "--falcon-api-id", "a",
            "--falcon-api-secret", "verysecretstuff",
            "--humio-token", "sometoken9",
        ],
        env={},
    )
    assert cfg.falcon_api_id == "a"


def test_describe_redacts_secrets_keeps_tail():
    cfg = resolve_config([], env=REQ)
    desc = cfg.describe()
    assert desc["falcon_api_secret"].endswith("ue")
    assert set(desc["falcon_api_secret"][:-2]) == {"*"}
    assert desc["humio_token"].endswith("89")
    assert desc["falcon_api_id"] == "id123"  # id is not a secret


def test_config_is_frozen():
    cfg = AppConfig()
    with pytest.raises(AttributeError):
        cfg.bulk_max_size = 1  # type: ignore[misc]


def test_config_drives_pipeline_end_to_end(tmp_path):
    """R20 wired to the engine: a resolved AppConfig starts the full
    parse -> enrich -> chunked-sink pipeline, with bulk_max_size bounding
    every POST chunk, offset_file as the checkpoint, and app_id in the
    @stream metadata."""
    import glob
    import json
    import os

    import pytest as _pytest

    pyspark = _pytest.importorskip("pyspark")
    from cses2humio_spark.cli import start_pipeline_from_config
    from cses2humio_spark.session import get_spark

    spark = get_spark("cli-e2e")
    src = tmp_path / "src"
    spool = tmp_path / "spool"
    ckpt = tmp_path / "offsets.db"
    os.makedirs(src)

    lines = [
        json.dumps(
            {
                "metadata": {"offset": o, "eventCreationTime": 1723500000000 + o},
                "event": {"n": o},
            }
        )
        for o in range(25)
    ]
    (src / "a.ndjson").write_text("\n".join(lines) + "\n")

    cfg = resolve_config(
        ["--bulk-max-size", "10", "--enrich", "--metadata", "--app-id", "e2e",
         "--offset-file", str(ckpt)],
        env=REQ,
    )
    q = start_pipeline_from_config(
        cfg, spark, str(src), str(spool), available_now=True
    )
    q.awaitTermination()

    chunks = []
    for p in sorted(glob.glob(str(spool / "*.json"))):
        with open(p) as f:
            chunks.append(json.load(f))
    events = [e for c in chunks for b in c["body"] for e in b["events"]]
    assert len(events) == 25
    assert all(
        len(b["events"]) <= 10 for c in chunks for b in c["body"]
    ), "bulk_max_size not respected"
    assert {e["attributes"]["@stream"] for e in events} == {"e2e"}
    assert os.path.isdir(ckpt), "offset_file did not become the checkpoint"


def test_console_script_end_to_end(capsys):
    """The console entry point (`cses2humio-spark`, pyproject
    [project.scripts] -> cli.main) end-to-end: resolve, echo redacted,
    exit 0. Run via `python -m`-style direct call (the script shim just
    calls main()) plus a subprocess equivalent so argv handling is real."""
    import subprocess
    import sys as _sys

    from cses2humio_spark.cli import main

    rc = main(
        ["--falcon-api-id", "id123", "--falcon-api-secret", "sec456",
         "--humio-token", "tok789", "--enrich"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "Starting with the following arguments" in out
    assert "sec456" not in out and "tok789" not in out, "secrets not redacted"

    proc = subprocess.run(
        [_sys.executable, "-c",
         "import sys; sys.path.insert(0, '/root/repo'); "
         "from cses2humio_spark.cli import main; "
         "sys.exit(main(['--falcon-api-id', 'a', '--falcon-api-secret', 'b', "
         "'--humio-token', 'c']))"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    assert "falcon_api_id" in proc.stdout


def test_query_cli_explain_flag(spark, capsys, monkeypatch):
    """--explain prints the compiled physical plan (pushed filters
    visible) without executing the query."""
    from cses2humio_spark.query_cli import main as qmain

    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    rc = qmain(
        ["#event_type = error | timechart(span=1d)",
         "--sf-dir", "/root/testdata/sf0.001", "--explain"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "PushedFilters" in out and "event_type" in out
    assert "HashAggregate" in out
