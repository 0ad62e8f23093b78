"""Sketch-based approximations have no cross-engine oracle; bound their
error against exact values instead."""

from __future__ import annotations

from pyspark.sql import functions as F

from cses2humio_spark.queries import QUERIES
from tests.conftest import SF_ORACLE


def test_approx_distinct_within_rsd(spark):
    approx = {
        r.event_type: r.approx_users
        for r in QUERIES["approx_distinct_users"](spark, SF_ORACLE).collect()
    }
    from cses2humio_spark.sources.catalog import load_table

    exact = {
        r.event_type: r.n
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        rel = abs(approx[et] - n) / n
        assert rel < 0.1, f"{et}: approx {approx[et]} vs exact {n} (rel {rel:.3f})"
