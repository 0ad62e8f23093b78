"""Data-profiling and skew-diagnostic queries — the operational side of
running a pipeline at 100 TB: before you schedule a join or an agg you
need per-column health (nulls / cardinality / range) and the key-skew
shape that decides whether the plain shuffle, AQE skew split, or an
explicit salted join is the right physical strategy
(``operators/joins.py::salted_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cses2humio_spark.queries.registry import query
from cses2humio_spark.sources.catalog import load_table

_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _profile_oracle() -> str:
    parts = [
        f"""
        SELECT '{c}' AS column_name,
          CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
          CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
          CAST(MIN({c}) AS VARCHAR) AS min_val,
          CAST(MAX({c}) AS VARCHAR) AS max_val
        FROM documents
        """
        for c in _DOC_COLS
    ]
    return " UNION ALL ".join(parts)


@query("profile_documents_columns", oracle=_profile_oracle())
def profile_documents_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiler over the documents table: per column
    the null count, exact distinct count, and min/max rendered as
    strings (binary collation on both engines). ONE wide aggregation
    computes all 5x4 measures (Catalyst plans the multi-distinct via
    expand), then ``stack`` unpivots the single wide row into one row
    per column — so a 100 TB profile is one scan + one shuffle of
    4-per-column partial states, not a scan per column."""
    docs = load_table(spark, sf_dir, "documents")
    aggs = []
    for c in _DOC_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in _DOC_COLS
    )
    return wide.selectExpr(
        f"stack({len(_DOC_COLS)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_val, max_val)"
    )


@query(
    "key_skew_profile",
    oracle="""
    WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      CAST(SUM(cnt) AS BIGINT) AS n_rows,
      CAST(MAX(cnt) AS BIGINT) AS max_key_rows,
      ROUND(MAX(cnt) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_key_share,
      ROUND(quantile_cont(cnt, 0.5), 4) AS p50_key_rows,
      ROUND(quantile_cont(cnt, 0.99), 4) AS p99_key_rows,
      ROUND(quantile_cont(cnt, 0.99) / quantile_cont(cnt, 0.5), 6) AS skew_ratio
    FROM c
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic over events.user_id: key cardinality,
    heaviest-key share, and the p99/p50 per-key-row ratio — the numbers
    that decide between a plain shuffle join, AQE skew handling, and
    ``salted_join`` (docs/SCALING.md measured salting 2.4x faster than
    AQE alone at a 70%-hot-key). Two-stage: map-side partial counts
    shuffle only (key, partial) pairs; the second aggregation reduces
    |keys| rows to one — both stages bounded by key cardinality, never
    event volume."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_key_rows"),
        F.round(F.max("cnt") / F.sum("cnt").cast("double"), 6).alias("top_key_share"),
        F.round(F.expr("percentile(cnt, 0.5)"), 4).alias("p50_key_rows"),
        F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_key_rows"),
        F.round(
            F.expr("percentile(cnt, 0.99)") / F.expr("percentile(cnt, 0.5)"), 6
        ).alias("skew_ratio"),
    )
