"""Scale-mechanism contracts: bucketed co-located joins eliminate the
shuffle; salted joins spread skewed keys without changing results."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from cses2humio_spark.operators.joins import salted_join
from cses2humio_spark.plans.explain import formatted_plan
from cses2humio_spark.sources.catalog import load_table, write_bucketed
from tests.conftest import SF_SMALL


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-bucketed tables join with zero Exchange nodes — the write-time
    pre-shuffle replaces the per-query shuffle."""
    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer")
    write_bucketed(
        orders, "b_orders", "o_custkey", buckets=4, path=str(tmp_path / "bo")
    )
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"),
        "b_customer",
        "o_custkey",
        buckets=4,
        path=str(tmp_path / "bc"),
    )
    bo, bc = spark.table("b_orders"), spark.table("b_customer")
    # force a non-broadcast join so the exchange (or its absence) is visible
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bc, on="o_custkey").select("o_orderkey", "c_name")
        plan = formatted_plan(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:1500]
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
    # sanity: same row count as the plain join
    plain = load_table(spark, SF_SMALL, "orders").join(
        load_table(spark, SF_SMALL, "customer").withColumnRenamed(
            "c_custkey", "o_custkey"
        ),
        on="o_custkey",
    )
    assert joined.count() == plain.count()
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")


def test_salted_join_matches_plain_join(spark):
    """salted_join result set == plain join; the hot key is spread over
    `salt` reducers instead of one."""
    orders = load_table(spark, SF_SMALL, "orders")
    nation = load_table(spark, SF_SMALL, "nation")
    # fabricate skew: 80% of rows share one key
    skewed = orders.withColumn(
        "n_nationkey",
        F.when(F.col("o_orderkey") % 5 != 0, F.lit(7)).otherwise(
            F.col("o_orderkey") % 25
        ),
    )
    plain = skewed.join(nation, on="n_nationkey").select(
        "o_orderkey", "n_name"
    )
    salted = salted_join(
        skewed, nation, "n_nationkey", salt=8, left_unique="o_orderkey"
    ).select("o_orderkey", "n_name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # the replicated side really is exploded `salt` times pre-join
    plan = formatted_plan(salted)
    assert re.search(r"Generate|explode", plan), plan[:1500]


def test_compact_for_scan_produces_disjoint_zone_maps(spark, tmp_path):
    """Write-side pruning: after compact_for_scan(ts), every parquet file
    covers a disjoint ts range (verified from the files' own min/max
    statistics) — a time-range predicate can skip all non-matching files."""
    import pyarrow.parquet as pq

    from cses2humio_spark.operators.reshape import compact_for_scan

    # sort key: event_id (bigint) — pyarrow does not surface min/max for
    # Spark's timestamp_ntz, but the mechanism is identical for ts
    events = load_table(spark, SF_SMALL, "events")
    out = str(tmp_path / "events_sorted")
    compact_for_scan(events, out, "event_id", n_files=8)

    ranges = []
    for root, _dirs, files in __import__("os").walk(out):
        for fname in files:
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(f"{root}/{fname}").metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            lo = min(
                md.row_group(g).column(idx["event_id"]).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(idx["event_id"]).statistics.max
                for g in range(md.num_row_groups)
            )
            ranges.append((lo, hi))
    assert len(ranges) >= 2, "expected multiple output files"
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {(lo1, hi1)} vs {(lo2, hi2)}"
    # and the data round-trips completely
    assert spark.read.parquet(out).count() == events.count()


def test_asof_join_no_chimera_rows(spark):
    """The latest right row's NULL field must stay NULL — per-column
    forward fill would stitch values from different right rows."""
    from cses2humio_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 3)], "k int, lts int")
    right = spark.createDataFrame(
        [(1, 1, 10, 5.0), (1, 2, 20, None)],
        "k int, rts int, rid int, price double",
    )
    row = asof_join(left, right, ["k"], "lts", "rts", ["rid", "price"]).collect()[0]
    assert row.rid == 20 and row.price is None


def test_asof_join_tolerance_nulls_stale_matches(spark):
    """A match staler than the tolerance yields NULL right columns; a
    fresh match survives; the left row itself is never dropped."""
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10), (1, 5), (2, 7)], "k int, lts int")
    right = spark.createDataFrame(
        [(1, 1, 100), (1, 4, 400)], "k int, rts int, rid int"
    )
    rows = {
        (r.k, r.lts): r.rid
        for r in asof_join(
            left, right, ["k"], "lts", "rts", ["rid"], tolerance=F.lit(3)
        ).collect()
    }
    assert rows[(1, 10)] is None  # latest match rts=4 is 6 stale > 3
    assert rows[(1, 5)] == 400  # rts=4 is 1 stale <= 3
    assert rows[(2, 7)] is None  # no right rows at all
    assert len(rows) == 3


def test_asof_join_rejects_column_overlap(spark):
    import pytest as _pytest

    from cses2humio_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 3, 9.9)], "k int, lts int, price double")
    right = spark.createDataFrame([(1, 1, 5.0)], "k int, rts int, price double")
    with _pytest.raises(ValueError):
        asof_join(left, right, ["k"], "lts", "rts", ["price"])


def test_window_over_bucketed_table_has_no_exchange(spark, tmp_path):
    """Storage-level win for the window-heavy family (dedup_first_event,
    sessionize, the as-of right side): a table bucketed on the window's
    partition key satisfies the Window's ClusteredDistribution, so the
    per-query hashpartitioning Exchange disappears — at 100 TB that is
    the whole shuffle of the fact table, paid once at write time."""
    from pyspark.sql.window import Window

    events = load_table(spark, SF_SMALL, "events")
    write_bucketed(
        events, "b_events", "user_id", buckets=4, sorted_by="user_id",
        path=str(tmp_path / "be"),
    )
    try:
        be = spark.table("b_events")
        w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
        deduped = (
            be.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        plan = formatted_plan(deduped)
        assert "Window" in plan, plan[:1500]
        assert "Exchange" not in plan, (
            f"window over bucketed table still shuffles:\n{plan[:2000]}"
        )
        # parity with the plain-table formulation
        plain = (
            events.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .count()
        )
        assert deduped.count() == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS b_events")


def test_partitioned_layout_prunes_directories(spark, tmp_path):
    """Hive-layout partitioning: a filter on the partition column becomes a
    PartitionFilter (directory-level pruning — never listed, never read),
    not a data-level PushedFilter; results match the unpartitioned scan."""
    from cses2humio_spark.plans.explain import formatted_plan
    from cses2humio_spark.sources.catalog import load_table, write_partitioned

    events = load_table(spark, SF_SMALL, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    write_partitioned(events, out, "event_date")

    back = spark.read.parquet(out)
    one_day = sorted(
        r.event_date for r in back.select("event_date").distinct().collect()
    )[0]
    q = back.filter(F.col("event_date") == F.lit(one_day)).select(
        "event_id", "event_type"
    )
    plan = formatted_plan(q)
    part_section = plan.split("PushedFilters")[0]
    assert "PartitionFilters" in plan and "event_date" in part_section, plan[:2000]
    # the date predicate must NOT appear as a data-level pushed filter —
    # pruning happens against directory metadata instead (a plan with no
    # PushedFilters line at all is equally correct: nothing to push)
    if "PushedFilters" in plan:
        pushed = plan.split("PushedFilters", 1)[1].splitlines()[0]
        assert "event_date" not in pushed, pushed
    # result parity with the in-memory filter
    expected = events.filter(F.col("event_date") == F.lit(one_day)).count()
    assert q.count() == expected and expected > 0


def test_zorder_layout_narrows_all_columns(spark, tmp_path):
    """Z-order clustering: per-file min/max ranges are narrow on EVERY
    z-ordered column, so a predicate on any of them skips most files; a
    single-column sort narrows only its own column. Measured on the
    events table over (user_id, value)."""
    from cses2humio_spark.operators.reshape import compact_for_scan, compact_zordered
    from cses2humio_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("value")
    )
    z_path = str(tmp_path / "zorder")
    s_path = str(tmp_path / "single")
    compact_zordered(ev, z_path, ["user_id", "value"], bits=6, n_files=16)
    compact_for_scan(ev, s_path, "user_id", n_files=16)

    def file_ranges(path):
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("user_id").alias("u_lo"), F.max("user_id").alias("u_hi"),
                F.min("value").alias("v_lo"), F.max("value").alias("v_hi"),
            )
            .collect()
        )

    def overlap_fraction(ranges, lo_col, hi_col, q_lo, q_hi):
        hit = sum(1 for r in ranges if r[hi_col] >= q_lo and r[lo_col] <= q_hi)
        return hit / len(ranges)

    stats = ev.agg(
        F.expr("percentile(user_id, 0.45)"), F.expr("percentile(user_id, 0.55)"),
        F.expr("percentile(value, 0.45)"), F.expr("percentile(value, 0.55)"),
    ).collect()[0]
    u_q, v_q = (stats[0], stats[1]), (stats[2], stats[3])

    zr, sr = file_ranges(z_path), file_ranges(s_path)
    assert len(zr) >= 8 and len(sr) >= 8  # enough files for skipping to mean anything

    # single-column layout: perfect on its own column, useless on the other
    assert overlap_fraction(sr, "u_lo", "u_hi", *u_q) <= 0.4
    assert overlap_fraction(sr, "v_lo", "v_hi", *v_q) >= 0.9

    # z-order: BOTH columns skip files for a 10%-band query (tie-heavy
    # low-cardinality user_id coarsens its buckets at this SF — the bound
    # is majority-ish, and the comparative claim vs single-sort is strict)
    z_u = overlap_fraction(zr, "u_lo", "u_hi", *u_q)
    z_v = overlap_fraction(zr, "v_lo", "v_hi", *v_q)
    assert z_u <= 0.7, f"user_id overlap {z_u}"
    assert z_v <= 0.7, f"value overlap {z_v}"
    # and z-order beats the single-column layout on its blind column by a
    # wide margin
    assert z_v <= overlap_fraction(sr, "v_lo", "v_hi", *v_q) - 0.25


def test_zorder_key_rejects_bit_overflow(spark):
    import pytest

    from cses2humio_spark.operators.reshape import zorder_key
    from cses2humio_spark.sources.catalog import load_table

    ev = load_table(spark, SF_SMALL, "events")
    with pytest.raises(ValueError, match="62"):
        zorder_key(ev, ["user_id", "value"], bits=32)


def test_dynamic_partition_overwrite_backfills_one_partition(spark, tmp_path):
    """Backfill contract: with partitionOverwriteMode=dynamic, overwriting
    a dataframe that contains ONLY partition p rewrites p and leaves every
    other partition untouched — the way a 100 TB date-partitioned table
    takes a one-day correction without a full rewrite. (Static mode, the
    default, would truncate the whole table first.)"""
    from pyspark.sql import functions as F

    path = str(tmp_path / "backfilled")
    base = spark.createDataFrame(
        [(d, i, float(i)) for d in ("d1", "d2", "d3") for i in range(10)],
        "day string, id int, v double",
    )
    base.write.partitionBy("day").parquet(path)

    fix = spark.createDataFrame(
        [("d2", i, 999.0) for i in range(3)], "day string, id int, v double"
    )
    (
        fix.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )

    back = spark.read.parquet(path)
    counts = {r["day"]: r["n"] for r in back.groupBy("day").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"d1": 10, "d2": 3, "d3": 10}
    assert back.where((F.col("day") == "d2") & (F.col("v") != 999.0)).count() == 0
    assert back.where((F.col("day") == "d1") & (F.col("v") == 999.0)).count() == 0


def test_native_runtime_bloom_filter_injects(spark, tmp_path):
    """Spark's own runtime Bloom filter (the planner-injected twin of
    operators/joins.py::bitmap_prefilter_semi_join) must inject a
    might_contain pre-filter on the big side of a selective shuffle join
    when enabled — documents the native path and the confs that gate it
    (application-side scan threshold defaults to 10GB, far above test
    data)."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
        part = spark.read.parquet(f"{SF_ORACLE}/part.parquet").filter(
            F.col("p_brand") == "Brand#7"
        )
        j = (
            li.join(part, li["l_partkey"] == part["p_partkey"])
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
