"""Alert-rule engine tests: HQL saved searches evaluated per micro-batch
(the reference's 'alert on Falcon Event Stream data' mission —
reference README.md:5-8 — closed inside the engine)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from cses2humio_spark.streaming.alerts import (
    AlertRule,
    evaluate_rules_on_batch,
    run_alert_rules,
)
from cses2humio_spark.sources.catalog import load_table
from tests.conftest import SF_SMALL


def test_evaluate_rules_batch_semantics(spark):
    ev = load_table(spark, SF_SMALL, "events")
    rules = [
        AlertRule("any_errors", "#event_type = error | count()",
                  value_column="_count", threshold=1),
        AlertRule("impossible", "value > 99999 | count()",
                  value_column="_count", threshold=1),
        AlertRule("hot_users", "event_type = error | top(user_id, limit=5)",
                  min_rows=1),
    ]
    alerts = {a["rule"]: a for a in evaluate_rules_on_batch(ev, rules, 7)}
    assert "any_errors" in alerts and alerts["any_errors"]["batch_id"] == 7
    assert "impossible" not in alerts  # threshold not met -> silent
    assert "hot_users" in alerts and alerts["hot_users"]["observed"] == 5


def test_rules_with_match_lookup(spark):
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer")
    rules = [
        AlertRule(
            "building_orders",
            "match(customer, field=o_custkey, key=c_custkey) "
            "| in(c_mktsegment, values=[BUILDING]) | count()",
            value_column="_count",
            threshold=1,
        )
    ]
    alerts = evaluate_rules_on_batch(
        orders, rules, 0, tables={"customer": customer}
    )
    assert len(alerts) == 1 and alerts[0]["observed"] >= 1


def test_alert_rules_fire_on_stream(spark, tmp_path):
    """End-to-end: rules attached to a file stream fire per micro-batch,
    records carry (batch_id, rule, observed), and a quiet rule stays
    silent — the full saved-search-to-alert loop."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", src / "p.parquet")
    sch = spark.read.parquet(str(src)).schema
    stream = spark.readStream.schema(sch).parquet(str(src))

    rules = [
        AlertRule("errors_present", "#event_type = error | count()",
                  value_column="_count", threshold=1),
        AlertRule("never", "event_type = nosuchtype | count()",
                  value_column="_count", threshold=1),
    ]
    got: list[dict] = []
    q = run_alert_rules(
        stream,
        rules,
        on_alerts=got.extend,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    fired = {a["rule"] for a in got}
    assert fired == {"errors_present"}
    n_errors = (
        spark.read.parquet(str(src))
        .filter(F.col("event_type") == "error")
        .count()
    )
    [rec] = [a for a in got if a["rule"] == "errors_present"]
    assert rec["observed"] == n_errors


def test_alert_replay_after_sink_failure(spark, tmp_path):
    """At-least-once contract: if alert delivery crashes mid-batch, the
    restarted query (same checkpoint) replays the batch and re-delivers —
    the duplicate carries the same (rule, batch_id) dedup key."""
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF_SMALL}/events.parquet", src / "p.parquet")
    sch = spark.read.parquet(str(src)).schema
    rules = [
        AlertRule("errors_present", "#event_type = error | count()",
                  value_column="_count", threshold=1),
    ]
    delivered: list[dict] = []
    crashed = {"done": False}

    def flaky_sink(alerts):
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected delivery failure")
        delivered.extend(alerts)

    def start():
        stream = spark.readStream.schema(sch).parquet(str(src))
        return run_alert_rules(
            stream, rules, on_alerts=flaky_sink,
            checkpoint_dir=str(tmp_path / "ck"),
            trigger_available_now=True,
        )

    q = start()
    try:
        q.awaitTermination(120)
    except Exception:
        pass  # first run dies on the injected failure
    assert crashed["done"] and not delivered
    q2 = start()  # same checkpoint -> replay
    q2.awaitTermination(120)
    assert [a["rule"] for a in delivered] == ["errors_present"]


def test_rule_with_threshold_but_no_value_column_is_config_error():
    import pytest

    with pytest.raises(ValueError):
        AlertRule("bad", "count()", value_column="_count")  # no threshold
    with pytest.raises(ValueError):
        AlertRule("bad2", "count()", threshold=5)  # no value_column


def test_value_rule_evaluation_is_row_bounded(spark):
    """The review contract: value-column rules aggregate (count, max) —
    they never collect offending rows. Verify observed == max offender on
    a batch with many rows over threshold."""
    ev = load_table(spark, SF_SMALL, "events")
    rules = [AlertRule("big_values", "select([value])",
                       value_column="value", threshold=1)]
    [a] = evaluate_rules_on_batch(ev, rules, 0)
    mx = ev.agg(F.max("value")).collect()[0][0]
    assert abs(float(a["observed"]) - mx) < 1e-9


def test_rule_evaluation_is_one_job_per_batch(spark):
    """Scale contract: N rules must cost ONE Spark job per batch (fused
    union-of-aggregates plan), not N driver-coordinated jobs — at a
    realistic 100-saved-search deployment per-rule job launch would
    overrun the trigger interval on job latency alone."""
    ev = load_table(spark, SF_SMALL, "events").persist()
    ev.count()  # materialize the cache OUTSIDE the measured job group
    rules = [
        AlertRule(f"r{i}", f"value > {i} | count()",
                  value_column="_count", threshold=1)
        for i in range(12)
    ]
    sc = spark.sparkContext
    sc.setJobGroup("alert-fused-eval", "jobs-per-batch pin")
    # foreachBatch plans run with AQE OFF (Spark disables it for streaming
    # micro-batches); mirror that here — under AQE each union branch's
    # shuffle stage is materialized as its own bookkeeping job, which is
    # scheduler-internal, not per-rule driver latency.
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        alerts = evaluate_rules_on_batch(ev, rules, 0)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        sc.setLocalProperty("spark.jobGroup.id", None)
    jobs = sc.statusTracker().getJobIdsForGroup("alert-fused-eval")
    ev.unpersist()
    assert len(alerts) == 12  # every rule fired (values exceed i)
    assert len(jobs) == 1, f"expected 1 fused job, saw {len(jobs)}: {jobs}"


def test_alert_record_carries_threshold(spark):
    """The emitted record includes the rule's threshold (None for
    row-count rules) so exactly-once/auditing sinks can detect rule-config
    changes across replays."""
    ev = load_table(spark, SF_SMALL, "events")
    rules = [
        AlertRule("v", "select([value])", value_column="value", threshold=1),
        AlertRule("rows", "event_type = error", min_rows=1),
    ]
    recs = {a["rule"]: a for a in evaluate_rules_on_batch(ev, rules, 3)}
    assert recs["v"]["threshold"] == 1
    assert recs["rows"]["threshold"] is None
    assert set(recs["v"]) == {"batch_id", "rule", "observed", "threshold", "query"}


def test_alert_throttle_suppresses_refires(spark, tmp_path):
    """Humio-style throttling: a rule with throttle_batches=1 that would
    fire every batch fires on batch 0, is suppressed on batch 1, and
    fires again on batch 2."""
    import glob
    import os

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        d = str(src / f"f{i}")
        load_table(spark, SF_SMALL, "events").limit(20).coalesce(
            1
        ).write.parquet(d)
        for f in glob.glob(os.path.join(d, "*")):
            os.utime(f, (1_700_000_000 + i * 60,) * 2)
    sch = spark.read.parquet(str(src / "f0")).schema
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    rules = [
        AlertRule("always", "count()", value_column="_count", threshold=1,
                  throttle_batches=1),
        AlertRule("every_batch", "count()", value_column="_count", threshold=1),
    ]
    got: list[dict] = []
    q = run_alert_rules(
        stream, rules, on_alerts=got.extend,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)
    fired = sorted(
        (a["batch_id"], a["rule"]) for a in got
    )
    assert fired == [
        (0, "always"), (0, "every_batch"),
        (1, "every_batch"),
        (2, "always"), (2, "every_batch"),
    ]


def test_alert_throttle_validation():
    import pytest

    with pytest.raises(ValueError):
        AlertRule("bad", "count()", throttle_batches=-1)


def test_load_alert_rules_from_json(tmp_path):
    import json

    import pytest

    from cses2humio_spark.streaming.alerts import load_alert_rules

    p = tmp_path / "rules.json"
    p.write_text(json.dumps([
        {"name": "errs", "query": "#event_type = error | count()",
         "value_column": "_count", "threshold": 5, "throttle_batches": 2},
        {"name": "any", "query": "event_type = view", "min_rows": 3},
    ]))
    rules = load_alert_rules(str(p))
    assert [r.name for r in rules] == ["errs", "any"]
    assert rules[0].threshold == 5 and rules[0].throttle_batches == 2
    assert rules[1].min_rows == 3

    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps([{"name": "x", "query": "count()",
                                "treshold": 1}]))
    with pytest.raises(ValueError, match="unknown rule key"):
        load_alert_rules(str(bad))
    dup = tmp_path / "dup.json"
    dup.write_text(json.dumps([{"name": "x", "query": "a = 1"},
                               {"name": "x", "query": "b = 2"}]))
    with pytest.raises(ValueError, match="duplicate rule names"):
        load_alert_rules(str(dup))


def test_alert_throttle_survives_restart(spark, tmp_path):
    """VERDICT r4 #8: the suppression window is persisted next to the
    checkpoint — a restarted query must NOT re-fire a rule whose window
    is still open, and must fire again once it closes. Four availableNow
    runs = four restarts, one micro-batch each."""
    import glob
    import os

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_SMALL, "events").limit(20)
    sch = None
    got: list[dict] = []

    def add_file_and_run(i):
        nonlocal sch
        d = str(src / f"f{i}")
        ev.coalesce(1).write.parquet(d)
        for f in glob.glob(os.path.join(d, "*")):
            os.utime(f, (1_700_000_000 + i * 60,) * 2)
        if sch is None:
            sch = spark.read.parquet(d).schema
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        rules = [
            AlertRule("throttled", "count()", value_column="_count",
                      threshold=1, throttle_batches=2),
            AlertRule("every_batch", "count()", value_column="_count",
                      threshold=1),
        ]
        q = run_alert_rules(
            stream, rules, on_alerts=got.extend, checkpoint_dir=ckpt,
            trigger_available_now=True,
        )
        q.awaitTermination(120)

    for i in range(4):
        add_file_and_run(i)  # each call is a fresh query over the ckpt

    fired = sorted((a["batch_id"], a["rule"]) for a in got)
    # throttled fires at batch 0, stays suppressed across the RESTARTS
    # that process batches 1 and 2, fires again at batch 3
    assert fired == [
        (0, "every_batch"), (0, "throttled"),
        (1, "every_batch"),
        (2, "every_batch"),
        (3, "every_batch"), (3, "throttled"),
    ], fired
    # the state file exists and names the last fired batches
    import json

    state = json.load(open(os.path.join(ckpt, "_alert_throttle.json")))
    assert state == {"throttled": 3, "every_batch": 3}


def test_alert_rules_hot_reload_and_bad_edit_safety(spark, tmp_path, caplog):
    """Rules-as-config hot reload: an edited rules file takes effect on
    the next batch without a stream restart; a BROKEN edit keeps the
    previous rule set running with a loud warning (an alerting pipeline
    must never die, or go silent, on a config typo); a broken INITIAL
    file refuses to start."""
    import glob
    import json as _json
    import logging
    import os

    from cses2humio_spark.streaming.alerts import run_alert_rules_from_file

    src = tmp_path / "src"
    src.mkdir()
    rules_path = str(tmp_path / "rules.json")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, SF_SMALL, "events").limit(20)
    got: list[dict] = []
    sch = spark.createDataFrame([], ev.schema).schema

    def write_rules(obj, raw=None):
        with open(rules_path, "w") as f:
            f.write(raw if raw is not None else _json.dumps(obj))
        os.utime(rules_path, None)

    def add_file_and_run(i):
        d = str(src / f"f{i}")
        ev.coalesce(1).write.parquet(d)
        for f in glob.glob(os.path.join(d, "*")):
            os.utime(f, (1_700_000_000 + i * 60,) * 2)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = run_alert_rules_from_file(
            stream, rules_path, on_alerts=got.extend,
            checkpoint_dir=ckpt, trigger_available_now=True,
        )
        q.awaitTermination(120)

    write_rules([{"name": "r_a", "query": "count()",
                  "value_column": "_count", "threshold": 1}])
    add_file_and_run(0)
    assert [(a["batch_id"], a["rule"]) for a in got] == [(0, "r_a")]

    # edit: different rule set takes effect on the next batch
    write_rules([{"name": "r_b", "query": "value > -1 | count()",
                  "value_column": "_count", "threshold": 1}])
    add_file_and_run(1)
    assert [(a["batch_id"], a["rule"]) for a in got][-1] == (1, "r_b")

    # broken edit + restart: the checkpoint's last known-good set (r_b)
    # resumes, with a loud warning
    with caplog.at_level(logging.WARNING,
                         logger="cses2humio_spark.streaming.alerts"):
        write_rules(None, raw='[{"name": "oops", "treshold": 1}]')
        add_file_and_run(2)
    assert [(a["batch_id"], a["rule"]) for a in got][-1] == (2, "r_b")
    assert any("last known-good" in r.message for r in caplog.records)

    # a broken INITIAL file refuses to start
    import pytest as _pytest

    bad_path = str(tmp_path / "bad.json")
    with open(bad_path, "w") as f:
        f.write("{not json")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    with _pytest.raises(ValueError, match="initial rule load"):
        run_alert_rules_from_file(
            stream, bad_path, on_alerts=got.extend,
            checkpoint_dir=str(tmp_path / "ckpt2"),
        )
