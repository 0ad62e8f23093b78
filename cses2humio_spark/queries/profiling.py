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


@query(
    "benford_first_digit_deviation",
    oracle="""
    WITH d AS (SELECT CAST(substr(CAST(CAST(o_totalprice AS DECIMAL(12,2))
                                       AS VARCHAR), 1, 1) AS INT) AS digit
               FROM orders WHERE o_totalprice >= 1),
    c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
    t AS (SELECT SUM(n) AS total FROM c)
    SELECT c.digit, CAST(c.n AS BIGINT) AS n,
      ROUND(c.n / CAST(t.total AS DOUBLE), 6) AS observed_freq,
      ROUND(log10(1.0 + 1.0 / c.digit), 6) AS benford_freq,
      ROUND(abs(c.n / CAST(t.total AS DOUBLE) - log10(1.0 + 1.0 / c.digit)), 6)
        AS abs_deviation
    FROM c, t
    """,
)
def benford_first_digit_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the classic
    fabricated-data screen: observed leading-digit frequencies vs the
    log10(1 + 1/d) expectation, with per-digit absolute deviation. The
    leading digit comes from the DECIMAL(12,2) rendering (exact, radix-10
    — no float-format ambiguity between engines). One narrow projection
    + a 9-group aggregation; the total joins back as a broadcast scalar."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.col("o_totalprice").cast("decimal(12,2)").cast("string"), 1, 1
    ).cast("int")
    c = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    t = c.agg(F.sum("n").alias("total"))
    benford = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
    obs = F.col("n") / F.col("total").cast("double")
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs, 6).alias("observed_freq"),
            benford.alias("benford_freq"),
            F.round(
                F.abs(obs - F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))), 6
            ).alias("abs_deviation"),
        )
    )


@query(
    "functional_dependency_check",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM (
          SELECT n_nationkey FROM nation
          GROUP BY n_nationkey HAVING COUNT(DISTINCT n_regionkey) > 1) v)
        AS BIGINT) AS nation_region_violations,
      CAST((SELECT COUNT(*) FROM (
          SELECT c_custkey FROM customer
          GROUP BY c_custkey HAVING COUNT(DISTINCT c_nationkey) > 1) v)
        AS BIGINT) AS customer_nation_violations,
      CAST((SELECT COUNT(*) FROM (
          SELECT o_orderkey FROM orders
          GROUP BY o_orderkey HAVING COUNT(DISTINCT o_custkey) > 1) v)
        AS BIGINT) AS order_customer_violations
    """,
)
def functional_dependency_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling — does the schema's implied
    X -> Y determinism actually hold in the data (nation→region,
    customer→nation, order→customer)? Violations are keys whose distinct
    dependent count exceeds 1. Each check is one two-stage aggregation
    whose shuffle carries (key, partial-distinct) pairs; all three
    one-row counters combine by broadcast. Zero on healthy data — and
    computed, not assumed."""

    def violations(table: str, key: str, dep: str, out: str) -> DataFrame:
        return (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count_distinct(dep).alias("nd"))
            .where(F.col("nd") > 1)
            .agg(F.count(F.lit(1)).cast("bigint").alias(out))
        )

    a = violations("nation", "n_nationkey", "n_regionkey", "nation_region_violations")
    b = violations("customer", "c_custkey", "c_nationkey", "customer_nation_violations")
    c = violations("orders", "o_orderkey", "o_custkey", "order_customer_violations")
    return a.crossJoin(F.broadcast(b)).crossJoin(F.broadcast(c))


@query(
    "orders_expectations_report",
    oracle="""
    WITH w AS (
      SELECT COUNT(*) AS n,
             ROUND(CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                        AS DOUBLE) / COUNT(*), 6) AS nullfrac,
             COUNT(*) - COUNT(DISTINCT o_orderkey) AS dups,
             SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                      THEN 1 ELSE 0 END) AS bad_domain,
             SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 1000000
                      THEN 1 ELSE 0 END) AS bad_range
      FROM orders),
    fk AS (SELECT COUNT(*) AS orphans FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM customer c
                             WHERE c.c_custkey = o.o_custkey))
    SELECT 'row_count_min:100' AS check, CAST(n AS VARCHAR) AS observed,
           CAST(n >= 100 AS INTEGER) AS passed FROM w
    UNION ALL
    SELECT 'null_fraction_max:o_custkey:0.0', CAST(nullfrac AS VARCHAR),
           CAST(nullfrac <= 0.0 AS INTEGER) FROM w
    UNION ALL
    SELECT 'unique:o_orderkey', CAST(dups AS VARCHAR),
           CAST(dups = 0 AS INTEGER) FROM w
    UNION ALL
    SELECT 'domain:o_orderstatus', CAST(bad_domain AS VARCHAR),
           CAST(bad_domain = 0 AS INTEGER) FROM w
    UNION ALL
    SELECT 'range:o_totalprice:0:1000000', CAST(bad_range AS VARCHAR),
           CAST(bad_range = 0 AS INTEGER) FROM w
    UNION ALL
    SELECT 'fk:o_custkey', CAST(orphans AS VARCHAR),
           CAST(orphans = 0 AS INTEGER) FROM fk
    """,
)
def orders_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-contract gate (`operators/quality.py` — the
    deequ shape): six checks over orders evaluated in ONE wide
    aggregation pass (row count, null fraction, key uniqueness, domain,
    range) plus one broadcast anti-join (FK orphans vs customer). The
    report (check, observed, passed) is what a batch-promotion gate
    consumes at 100 TB; metric rendering is integer/string so the oracle
    comparison is exact."""
    from cses2humio_spark.operators.quality import expectations_report

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return expectations_report(
        orders,
        [
            ("row_count_min", 100),
            ("null_fraction_max", "o_custkey", 0.0),
            ("unique", "o_orderkey"),
            ("domain", "o_orderstatus", ["O", "F", "P"]),
            ("range", "o_totalprice", 0, 1_000_000),
            ("fk", "o_custkey", customer, "c_custkey"),
        ],
    )


@query(
    "props_schema_signatures",
    oracle="""
    SELECT array_to_string(list_sort(json_keys(props)), ',') AS key_set,
           COUNT(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def props_schema_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift monitor for the dynamic JSON payload (SURVEY §1.2 —
    the reference's events are schemaless; the engine's answer to "did a
    new field appear in the feed?"): group events by the SORTED key-set
    of their props object. A new producer field shows up as a new
    signature row the moment it arrives; at 100 TB this is one
    map-side-combined aggregation whose group count is the number of
    distinct SHAPES, not events. The alert-rule twin: attach
    `groupBy(key_set)` to the stream and alert on unseen signatures."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.array_join(
            F.array_sort(F.json_object_keys("props")), ","
        ).alias("key_set")
    ).groupBy("key_set").agg(F.count(F.lit(1)).alias("n_events"))
