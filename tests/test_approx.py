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


def test_pandas_udf_scalar_and_iterator_match_jvm_norm(spark):
    """UDF-surface parity (SURVEY §2.2): the scalar and iterator pandas
    UDFs agree with the JVM-side higher-order-function norm to 1e-6."""
    from pyspark.sql import functions as F

    from cses2humio_spark.functions.udfs import iter_norm_udf, scalar_norm_udf
    from cses2humio_spark.functions.vectors import l2_norm
    from cses2humio_spark.sources.catalog import load_table
    from tests.conftest import SF_SMALL

    emb = load_table(spark, SF_SMALL, "embeddings").limit(100)
    rows = emb.select(
        l2_norm(F.col("embedding")).alias("jvm"),
        scalar_norm_udf()(F.col("embedding")).alias("scalar"),
        iter_norm_udf()(F.col("embedding")).alias("it"),
    ).collect()
    assert len(rows) == 100
    for r in rows:
        assert abs(r.jvm - r.scalar) < 1e-6
        assert abs(r.jvm - r.it) < 1e-6
