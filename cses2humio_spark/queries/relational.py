"""Relational query surface: scan/filter/project, joins (all shapes),
aggregation, window functions, sort/limit/top-k, set ops, dedup
(SURVEY.md §2.2). Every query has an exact DuckDB oracle.

Scale notes per query are inline; the common posture: facts shuffle at most
once per agg/join key, dimensions broadcast, top-k is TakeOrdered (no full
sort), windows always partition by a high-cardinality key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cses2humio_spark.operators.aggregates import top_k
from cses2humio_spark.operators.dedup import dedup_exact_by_key
from cses2humio_spark.operators.joins import asof_join, range_join
from cses2humio_spark.operators.windows import running_total, top_k_per_group
from cses2humio_spark.queries._util import avg_exact, fmt_date, frac, money, sum_money
from cses2humio_spark.queries.registry import query
from cses2humio_spark.sources.catalog import load_table

_DEC1 = 'CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))'


# --- aggregation ---------------------------------------------------------

@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM({_DEC1}) AS DOUBLE) AS sum_disc_price,
      CAST(SUM({_DEC1} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed-down filter → hash agg (partial+final).
    Shuffle carries only (2 group keys x ~4 groups) after map-side combine."""
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = money("l_extendedprice") * (one - frac("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
            sum_money("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(disc_price * (one + frac("l_tax"))).cast("double").alias("sum_charge"),
            avg_exact("l_quantity", "avg_qty"),
            avg_exact("l_extendedprice", "avg_price"),
            avg_exact("l_discount", "avg_disc", scale="decimal(3,2)"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "grouped_stats_orders",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
      COUNT(*) AS cnt,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_price,
      MIN(o_totalprice) AS min_price,
      MAX(o_totalprice) AS max_price
    FROM orders GROUP BY o_orderpriority, o_orderstatus
    """,
)
def grouped_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            sum_money("o_totalprice", "sum_price"),
            avg_exact("o_totalprice", "avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "rollup_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: Spark expands to a union of grouping sets in one pass
    (Expand operator) — still a single shuffle."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(money("l_quantity")).cast("double").alias("sum_qty"),
        )
    )


@query(
    "cube_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@query(
    "distinct_users_per_type",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct — Spark plans a two-stage partial-distinct agg."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "percentile_order_price",
    oracle="""
    SELECT o_orderpriority,
      ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentile (matches DuckDB quantile_cont)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        )
    )


# --- joins ---------------------------------------------------------------

@query(
    "top_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
      CAST(SUM({_DEC1}) AS DOUBLE) AS revenue,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def top_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    customer is broadcast (under threshold); top-k is TakeOrdered."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-03-15 00:00:00"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-03-15 00:00:00"
    )
    one = F.lit(1).cast("decimal(3,2)")
    joined = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(money("l_extendedprice") * (one - frac("l_discount")))
        .cast("double")
        .alias("revenue")
    )
    return top_k(
        agg, [F.col("revenue").desc(), F.col("l_orderkey").asc()], 10
    ).select(
        "l_orderkey",
        "revenue",
        fmt_date("o_orderdate", "orderdate"),
        "o_orderpriority",
    )


@query(
    "revenue_by_nation",
    oracle=f"""
    SELECT n_name, r_name,
      CAST(SUM({_DEC1}) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
    FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    GROUP BY n_name, r_name
    """,
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact × 3 broadcast dims — zero fact-side shuffles before
    the final agg; Catalyst collapses to one stage of broadcast hash joins."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(money("l_extendedprice") * (one - frac("l_discount")))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "brand_revenue_broadcast",
    oracle="""
    SELECT p_brand,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS gross,
      COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def brand_revenue_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            sum_money("l_extendedprice", "gross"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "customers_with_orders_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
)
def customers_with_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "customers_without_orders_anti",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    GROUP BY c_nationkey
    """,
)
def customers_without_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "full_outer_nation_activity",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    j = cust.join(sup, on="nk", how="full_outer")
    return j.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "events_range_self_join",
    oracle="""
    SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS n_pairs
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    GROUP BY a.event_type, b.event_type
    """,
)
def events_range_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join with an equi anchor (user_id) AND a 5-minute time band as
    a second equi key (operators/joins.banded_range_join): probe work is
    bounded per (user, band), so cost follows event RATE, not per-user
    history length — the plain equi-anchor form re-measured 14.5x wall on
    10x data because every user's full history cross-compared. The time
    window applies in full as the residual; band(b) <= band(a)+1 for any
    b <= a+5min, so banding loses no matches."""
    from cses2humio_spark.operators.joins import banded_range_join

    a = load_table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("ts").alias("ts_a"), F.col("event_type").alias("type_a")
    )
    b = load_table(spark, sf_dir, "events").select(
        F.col("user_id"), F.col("ts").alias("ts_b"), F.col("event_type").alias("type_b")
    )
    joined = banded_range_join(
        a,
        b,
        on=["user_id"],
        left_ts="ts_a",
        right_ts="ts_b",
        span_seconds=300,
        condition=(F.col("ts_b") > F.col("ts_a"))
        & (F.col("ts_b") <= F.col("ts_a") + F.expr("INTERVAL 5 MINUTES")),
    )
    return joined.groupBy("type_a", "type_b").agg(F.count(F.lit(1)).alias("n_pairs"))


@query(
    "asof_latest_order",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
             MAX(o_totalprice) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    ), j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC) AS rn
      FROM events e JOIN o ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey, o_totalprice
    FROM j WHERE rn = 1
    """,
)
def asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event picks the user's latest order at event time.
    Union+window formulation — both sides shuffle once on user_id
    (operators/joins.py:asof_join)."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    # deterministic: one row per (custkey, orderdate) before the as-of
    o = (
        orders.groupBy(
            F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
        )
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max("o_totalprice").alias("o_totalprice"),
        )
    )
    out = asof_join(
        ev,
        o,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return out.filter(F.col("o_orderkey").isNotNull()).select(
        "event_id", "user_id", "o_orderkey", "o_totalprice"
    )


@query(
    "asof_order_with_staleness_bound",
    oracle="""
    WITH o AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey,
             MAX(o_totalprice) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    ), j AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC) AS rn
      FROM events e
      LEFT JOIN o ON e.user_id = o.o_custkey
                 AND o.o_orderdate <= e.ts
                 AND o.o_orderdate >= e.ts - INTERVAL 90 DAY
    )
    SELECT event_id, user_id, o_orderkey, o_totalprice
    FROM j WHERE rn = 1
    """,
)
def asof_order_with_staleness_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance: the matched order may be at most 90
    days older than the event, else the right side is NULL (pandas
    ``merge_asof(tolerance=...)`` semantics). Same single-shuffle
    union+window plan as ``asof_latest_order`` — the staleness check is a
    post-fill projection, not a second join."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    o = (
        orders.groupBy(
            F.col("o_custkey").alias("user_id"), F.col("o_orderdate")
        )
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max("o_totalprice").alias("o_totalprice"),
        )
    )
    return asof_join(
        ev,
        o,
        on=["user_id"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
        tolerance=F.expr("INTERVAL 90 DAYS"),
    ).select("event_id", "user_id", "o_orderkey", "o_totalprice")


@query(
    "nation_trade_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(year FROM l_shipdate) AS l_year,
             {_DEC1} AS vol
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by ship
    year — the classic 6-table join-reordering stress. Scale posture: the
    two-nation filter lands on the broadcast nation dims BEFORE the joins,
    so supplier and customer shrink to the selected nations first and the
    fact tables join against pre-pruned sides; only the cross-pair OR
    remains as a residual. Nation broadcasts; the planner (AQE) picks
    broadcast vs shuffle for the pruned supplier/customer sides."""
    pair = ["NATION_1", "NATION_2"]
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    n1 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .select("s_suppkey", "supp_nation")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .select("c_custkey", "cust_nation")
    )
    vol = money("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - frac("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(vol).cast("double").alias("revenue"))
    )


@query(
    "large_order_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
      CAST(o_totalprice AS DOUBLE) AS totalprice,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY totalprice DESC, o_orderkey LIMIT 100
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate → HAVING filter → semi-join back into the
    fact join. Scale posture: lineitem shuffles once on l_orderkey for the
    HAVING aggregate (map-side partial combine first), and only the ~1% of
    qualifying keys survive; that small key set broadcasts into a left-semi
    join so orders is pruned before the wide customer/lineitem joins ever
    run. Final top-100 is TakeOrdered (per-partition heap + driver merge),
    never a global sort. Unique o_orderkey tiebreak keeps the LIMIT
    deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("q"))
        .filter(F.col("q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(F.broadcast(big), F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(money("l_quantity")).cast("double").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            fmt_date("o_orderdate", "orderdate"),
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# --- window functions ----------------------------------------------------

@query(
    "top3_orders_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders.select("o_custkey", "o_orderkey", "o_totalprice"),
        part_by=["o_custkey"],
        order=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        k=3,
    )


@query(
    "customer_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_total
    FROM orders
    """,
)
def customer_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    out = running_total(
        orders,
        part_by=["o_custkey"],
        order=[F.col("o_orderdate").asc(), F.col("o_orderkey").asc()],
        value=money("o_totalprice"),
    )
    return out.select(
        "o_custkey",
        "o_orderkey",
        F.col("running_total").cast("double").alias("running_total"),
    )


@query(
    "order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
      date_diff('day',
        LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        o_orderdate) AS gap_days
    FROM orders
    """,
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).alias("gap_days"),
    )


@query(
    "rank_parts_by_size",
    oracle="""
    SELECT p_brand, p_partkey, p_size,
      RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_rank,
      DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_size DESC) AS size_dense_rank,
      NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_size DESC, p_partkey) AS quartile
    FROM part
    """,
)
def rank_parts_by_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_size").desc())
    wt = Window.partitionBy("p_brand").orderBy(
        F.col("p_size").desc(), F.col("p_partkey").asc()
    )
    return part.select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.rank().over(w).alias("size_rank"),
        F.dense_rank().over(w).alias("size_dense_rank"),
        F.ntile(4).over(wt).alias("quartile"),
    )


@query(
    "order_price_distribution_rank",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
      ROUND(PERCENT_RANK() OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice, o_orderkey), 6)
        AS price_prank,
      ROUND(CUME_DIST() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice, o_orderkey), 6)
        AS price_cume,
      CAST(NTILE(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS INTEGER)
        AS price_quartile
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def order_price_distribution_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1)),
    cume_dist (rows<=current / n), and ntile(4) bucketing per priority
    group — exact rationals in double / integer bucket ids, identical in
    any engine; the unique o_orderkey tiebreak makes ranks deterministic.
    One shuffle on the partition key, same as any ranking window."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("price_prank"),
        F.round(F.cume_dist().over(w), 6).alias("price_cume"),
        F.ntile(4).over(w).alias("price_quartile"),
    )


# --- sort / limit / set ops / dedup --------------------------------------

@query(
    "top20_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def top20_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject: per-partition heap of 20, no
    full sort even at 100 TB."""
    return top_k(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        ),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        20,
    )


@query(
    "setop_union_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def setop_union_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.union(s).distinct()


@query(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.intersect(s)


@query(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return c.subtract(s)  # EXCEPT (distinct) semantics


@query(
    "dedup_first_event",
    oracle="""
    SELECT user_id, event_type, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s FROM (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact dedup (first row per key under a total order) —
    the reproducible alternative to dropDuplicates."""
    ev = load_table(spark, sf_dir, "events")
    out = dedup_exact_by_key(
        ev,
        keys=["user_id", "event_type"],
        order=[F.col("ts").asc(), F.col("event_id").asc()],
    )
    return out.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp("ts").cast("bigint").alias("ts_s"),
    )


@query(
    "grouping_sets_flags",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def grouping_sets_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) — single Expand + one
    shuffle, same cost shape as a plain groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
        """
    )


@query(
    "setop_intersect_all_priorities",
    oracle="""
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    """,
)
def setop_intersect_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (multiset semantics — kept distinct from INTERSECT)."""
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("prio")
    )
    op = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderpriority").alias("prio")
    )
    return f.intersectAll(op)


@query(
    "setop_except_all_priorities",
    oracle="""
    SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'P'
    """,
)
def setop_except_all_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderpriority").alias("prio")
    )
    p = o.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_orderpriority").alias("prio")
    )
    return f.exceptAll(p)


@query(
    "union_by_name_parties",
    oracle="""
    SELECT name, nationkey, kind FROM (
      SELECT c_name AS name, c_nationkey AS nationkey, 'customer' AS kind FROM customer
      UNION ALL
      SELECT s_name, s_nationkey, 'supplier' FROM supplier
    ) WHERE nationkey < 3
    """,
)
def union_by_name_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName: schema-aligned union regardless of column order."""
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nationkey"),
        F.lit("customer").alias("kind"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),  # deliberately different order
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_name").alias("name"),
    )
    return c.unionByName(s).filter(F.col("nationkey") < 3)


@query(
    "cross_join_region_priority",
    oracle="""
    SELECT r_name, o_orderpriority AS prio FROM region
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders)
    """,
)
def cross_join_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join — legitimate ONLY for tiny-x-tiny dimension
    grids like this (5 x 5); the planner is free to broadcast."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    p = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio")
    ).distinct()
    return r.crossJoin(p)


@query(
    "filter_in_between_like",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 100000 AND 200000
      AND o_orderpriority LIKE '%URGENT%'
    """,
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE predicate surface — all pushable to the scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderpriority").like("%URGENT%")
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@query("approx_distinct_users")  # HLL sketch differs per engine -> rows-only
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) + approx percentile — the
    sketch-based path for 100 TB cardinalities where exact distinct is a
    full shuffle of the key universe. Sketches are engine-specific, so no
    SQL oracle (rows-only); tests/test_approx.py bounds the relative error
    against the exact values instead."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_value"),
    )


@query(
    "collect_statuses_per_priority",
    oracle="""
    SELECT o_orderpriority,
      array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',') AS statuses,
      array_to_string(list_sort(list(o_orderstatus)), ',') AS status_multiset,
      COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def collect_statuses_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set / collect_list surface. Both are wrapped in sort_array
    so the result is a deterministic value regardless of task/partition
    arrival order — the only way collection aggs are reproducible on a
    cluster. Partial aggregation applies: each task collects locally, the
    shuffle carries one partial list per (task, key). The arrays are
    serialized with array_join for the oracle contract — the driver's
    pandas row-hasher cannot hash list cells."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.sort_array(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.array_join(F.sort_array(F.collect_list("o_orderstatus")), ",").alias(
            "status_multiset"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "order_timeline_analytics",
    oracle="""
    SELECT o_custkey, o_orderkey,
      date_diff('day', o_orderdate,
        LEAD(o_orderdate) OVER w) AS days_to_next,
      CAST(FIRST_VALUE(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
        AS first_price,
      CAST(LAST_VALUE(CAST(o_totalprice AS DECIMAL(12,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           AS DOUBLE) AS last_price,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS moving_sum3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def order_timeline_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function surface: lead / first_value / last_value (full
    frame) / moving frame agg, all over one customer-partitioned sort —
    Catalyst collapses the four frames into a single Window exchange+sort.
    Money goes through DECIMAL so the moving sum is order-exact."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w_mov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.lead("o_orderdate").over(w), F.col("o_orderdate")).alias(
            "days_to_next"
        ),
        F.first(money("o_totalprice")).over(w).cast("double").alias("first_price"),
        F.last(money("o_totalprice")).over(w_full).cast("double").alias("last_price"),
        F.sum(money("o_totalprice")).over(w_mov).cast("double").alias("moving_sum3"),
    )


@query(
    "global_math_stats",
    oracle="""
    SELECT COUNT(*) AS n_items,
      ROUND(SQRT(SUM(POW(l_quantity, 2)) / COUNT(*)), 6) AS rms_qty,
      ROUND(LN(1 + SUM(l_quantity)), 6) AS ln_total_qty,
      ROUND(LOG10(SUM(l_quantity)), 6) AS log10_total_qty,
      CAST(FLOOR(SUM(l_quantity) / COUNT(*)) AS BIGINT) AS floor_avg_qty,
      CAST(CEIL(SUM(l_quantity) / COUNT(*)) AS BIGINT) AS ceil_avg_qty,
      ROUND(ABS(MIN(l_discount) - MAX(l_discount)), 6) AS disc_spread
    FROM lineitem
    """,
)
def global_math_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (no-group) aggregation + math-function surface: sqrt/pow/
    ln/log10/floor/ceil/abs. Sums of integral-valued doubles are exactly
    representable, so the math is order-independent and oracle-exact.
    A global agg is a two-stage plan: partial per partition, one final
    reducer — never a single-node bottleneck on rows."""
    li = load_table(spark, sf_dir, "lineitem")
    s = F.sum("l_quantity")
    n = F.count(F.lit(1))
    return li.agg(
        n.alias("n_items"),
        F.round(F.sqrt(F.sum(F.pow("l_quantity", F.lit(2))) / n), 6).alias("rms_qty"),
        F.round(F.log(F.lit(1) + s), 6).alias("ln_total_qty"),
        F.round(F.log10(s), 6).alias("log10_total_qty"),
        F.floor(s / n).cast("bigint").alias("floor_avg_qty"),
        F.ceil(s / n).cast("bigint").alias("ceil_avg_qty"),
        F.round(F.abs(F.min("l_discount") - F.max("l_discount")), 6).alias(
            "disc_spread"
        ),
    )


@query(
    "right_join_top_with_nulls_first",
    oracle="""
    SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY o.o_totalprice DESC NULLS FIRST, c.c_custkey, o.o_orderkey
    LIMIT 50
    """,
)
def right_join_top_with_nulls_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT outer join + explicit NULLS FIRST placement under a
    descending sort + limit: customers with no orders surface first (their
    price is null), then the biggest orders. The (price, custkey, orderkey)
    key is a total order, so the limited set is deterministic. Catalyst
    plans the right join as a broadcast/shuffled hash join with the
    build side flipped — no special-casing needed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"], "right")
        .orderBy(
            F.col("o_totalprice").desc_nulls_first(),
            F.col("c_custkey").asc(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
        .select("c_custkey", "o_orderkey", "o_totalprice")
    )


@query(
    "pivot_status_counts",
    oracle="""
    SELECT o_orderpriority,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
      CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational value pivot (crosstab): order counts per priority x
    status. Pivot values are EXPLICIT — with them, Spark skips the extra
    distinct-values discovery job and the pivot compiles to one hash agg
    with CASE expressions, exactly the oracle's shape. At scale, always
    pass the value list."""
    o = load_table(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("f_cnt"),
        F.coalesce(F.col("O"), F.lit(0)).alias("o_cnt"),
        F.coalesce(F.col("P"), F.lit(0)).alias("p_cnt"),
    )


@query(
    "sql_exists_and_scalar_subquery",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.8 FROM orders o2)
    )
    """,
)
def sql_exists_and_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface: the engine's tables registered as views and queried
    through spark.sql with a correlated EXISTS + an uncorrelated scalar
    subquery. Catalyst rewrites EXISTS into a left-semi join and evaluates
    the scalar subquery once (a broadcast single-row plan) — same physical
    shapes as the DataFrame formulations elsewhere in this module."""
    from cses2humio_spark.sources.catalog import load_table as _lt

    _lt(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > (SELECT AVG(o2.o_totalprice) * 1.8 FROM orders o2)
        )
        """
    )


@query(
    "not_in_customers_outside_region",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
    FROM customer
    WHERE c_nationkey NOT IN (
        SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'AFRICA')
    GROUP BY c_mktsegment
    """,
)
def not_in_customers_outside_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery — the null-aware anti-join, a different physical
    operator from left_anti (a NULL key or a NULL in the subquery must
    yield UNKNOWN, not a match). Catalyst plans it as a null-aware
    broadcast anti-join when the subquery side is small, as here: the
    nation-in-region key set is tiny and broadcasts, so customer is
    filtered in its scan stage with no shuffle before the aggregate."""
    from cses2humio_spark.sources.catalog import load_table as _lt

    for t in ("customer", "nation", "region"):
        _lt(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS n_customers,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
        FROM customer
        WHERE c_nationkey NOT IN (
            SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'AFRICA')
        GROUP BY c_mktsegment
        """
    )


_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R')
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""


@query("sole_blame_suppliers", oracle=_Q21_SQL)
def sole_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted to this schema's columns): suppliers solely
    responsible for a returned line on a finished multi-supplier order —
    a correlated EXISTS and a correlated NOT EXISTS against the SAME fact
    table. Catalyst rewrites them into a left-semi and a left-anti join on
    l_orderkey, so lineitem is shuffled on one key for all three sides
    (self-joins reuse the exchange under AQE); supplier broadcasts. The
    unique s_name tiebreak keeps LIMIT deterministic cross-engine."""
    from cses2humio_spark.sources.catalog import load_table as _lt

    for t in ("supplier", "lineitem", "orders"):
        _lt(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21_SQL)


_Q22_SQL = """
SELECT c_mktsegment, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
GROUP BY c_mktsegment
"""


@query("dormant_rich_customers", oracle=_Q22_SQL)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: an uncorrelated scalar aggregate subquery feeding a
    filter, plus a correlated NOT EXISTS against a filtered fact —
    above-average-balance customers with no finished order, per segment.
    Catalyst evaluates the scalar subquery once (single-row broadcast),
    rewrites NOT EXISTS to a left-anti join on o_custkey with the status
    predicate pushed into the orders scan, and the surviving sliver of
    customer feeds one partial+final hash aggregate."""
    from cses2humio_spark.sources.catalog import load_table as _lt

    for t in ("customer", "orders"):
        _lt(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q22_SQL)


@query(
    "median_price_by_priority",
    oracle="""
    SELECT o_orderpriority,
      ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
      ROUND(quantile_cont(o_totalprice, 0.95), 4) AS p95_price,
      COUNT(*) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def median_price_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (interpolated median + p95 per group) —
    the per-key latency/price distribution view. Exact percentile sorts
    within each group; at 100 TB cardinality the approx variant
    (percentile_approx, also in approx_distinct_users) is the scale path."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "discount_revenue_probe",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def discount_revenue_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + global aggregate, zero joins. The
    whole predicate (date range, discount band, quantity cap) pushes into
    the parquet scan as PushedFilters; the aggregate is a map-side partial
    into a single-row final — at 100 TB this is scan-bandwidth-bound and
    embarrassingly parallel, the canonical row-group-pruning benchmark."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01 00:00:00")
            & (F.col("l_shipdate") < "1998-01-01 00:00:00")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(money("l_extendedprice") * frac("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "returned_order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def returned_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS decorrelated to a left-semi join.
    The semi join never materializes lineitem columns and stops probing an
    order on first match; the quarter filter prunes orders before the
    shuffle, and the returnflag filter prunes the build side. The final
    agg runs on the surviving sliver (5 priorities)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(returned, o.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "min_cost_supplier_per_part",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (SELECT l_partkey, MIN(unit_cost) AS min_cost
             FROM ps GROUP BY l_partkey)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
           b.min_cost
    FROM ps
    JOIN best b ON ps.l_partkey = b.l_partkey AND ps.unit_cost = b.min_cost
    JOIN part p ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'SMALL'
    ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
    LIMIT 100
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: a correlated MIN subquery (cheapest supplier per
    part) decorrelated into aggregate + self-join on (key, min). lineitem
    stands in for partsupp (no partsupp table in this dataset): unit_cost
    = min observed extendedprice/quantity per (part, supplier). One wide
    shuffle builds ps; `best` re-aggregates the already-reduced relation;
    the equality join back on (partkey, min_cost) is safe because both
    sides compute the identical IEEE double. part/supplier/nation are
    broadcast dims; the part filter prunes before the join; final TakeOrdered
    (no global sort) with a total order so the LIMIT edge is deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    best = (
        ps.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "SMALL")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        ps.join(
            best,
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .drop("b_partkey")
        .join(F.broadcast(part), F.col("p_partkey") == ps.l_partkey)
        .join(F.broadcast(sup), F.col("s_suppkey") == ps.l_suppkey)
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "min_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(0.10 AS DECIMAL(3,2))
                      * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2
    """,
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: 5-relation star with a LIKE-filtered part dim and a
    profit expression spanning fact and dim columns (10% of retailprice
    stands in for ps_supplycost — no partsupp table). part/supplier/nation
    broadcast, so lineitem reaches the orders join carrying only surviving
    rows; orders-lineitem is the one big shuffle pair. The money math
    stays exact DECIMAL until the final double cast, so the sum is
    partitioning-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    one = F.lit(1).cast("decimal(3,2)")
    cost_rate = F.lit(0.10).cast("decimal(3,2)")
    profit_expr = money("l_extendedprice") * (one - frac("l_discount")) - money(
        "p_retailprice"
    ) * cost_rate * money("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(sup), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit_expr).cast("double").alias("profit"))
    )


@query(
    "supplier_variety_by_part_attrs",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_type <> 'MEDIUM'
      AND p_size IN (5, 10, 15, 20, 25, 30)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def supplier_variety_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per part attribute triple with a
    NOT IN supplier exclusion. The exclusion list (suppliers in deficit)
    is tiny → broadcast left-anti join, no shuffle; the part filter
    broadcasts too. count_distinct expands to a two-phase aggregate
    (distinct-ize on (triple, suppkey), then count) — two narrow shuffles
    on already-reduced data rather than one wide one."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    deficit = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(
            F.broadcast(deficit),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


@query(
    "heavy_shipper_suppliers",
    oracle="""
    WITH qual AS (
      SELECT l_suppkey
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_suppkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 100
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      AND s_suppkey IN (SELECT l_suppkey FROM qual)
    """,
)
def heavy_shipper_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries flattened to a chain of
    semi-joins — suppliers in a nation set who shipped >100 units of
    'small%' parts in 1997 (shipped volume stands in for partsupp
    availqty). The inner aggregate reduces lineitem to one row per
    qualifying supplier BEFORE the semi join, so the join probe side is
    |suppliers|, not |lineitems|; part and nation broadcast; HAVING on the
    exact-decimal sum keeps the threshold partitioning-independent."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    qual = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(money("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 100)
        .select("l_suppkey")
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@query(
    "snapshot_diff_orders",
    oracle="""
    WITH a AS (SELECT o_orderkey AS k,
                 md5(o_orderstatus || '|' || CAST(o_totalprice AS VARCHAR)
                     || '|' || o_orderpriority) AS h
               FROM orders WHERE o_orderkey % 10 <> 0),
    b AS (SELECT o_orderkey AS k,
            md5(CASE WHEN o_orderkey % 7 = 0 THEN 'F' ELSE o_orderstatus END
                || '|' || CAST(o_totalprice AS VARCHAR)
                || '|' || o_orderpriority) AS h
          FROM orders WHERE o_orderkey % 11 <> 0)
    SELECT
      CAST(SUM(CASE WHEN a.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
      CAST(SUM(CASE WHEN b.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
      CAST(SUM(CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                    AND a.h <> b.h THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
      CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
    FROM a FULL OUTER JOIN b ON b.k = a.k
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff — the audit primitive for pipeline re-runs:
    two snapshots (derived deterministically from orders: snapshot B
    drops different keys and flips some statuses) compared by key with a
    row-content hash, counting added / removed / changed / unchanged.
    Rows reduce to (key, 16-byte digest) BEFORE the full-outer join, so
    at 100 TB the shuffle carries digests, never row bodies — the same
    never-ship-the-payload rule as content dedup."""
    o = load_table(spark, sf_dir, "orders")

    def snap(status_col):
        return F.md5(
            F.concat_ws(
                "|",
                status_col,
                F.col("o_totalprice").cast("string"),
                F.col("o_orderpriority"),
            )
        )

    a = o.where(F.col("o_orderkey") % 10 != 0).select(
        F.col("o_orderkey").alias("k"), snap(F.col("o_orderstatus")).alias("h_a")
    )
    b = o.where(F.col("o_orderkey") % 11 != 0).select(
        F.col("o_orderkey").alias("k"),
        snap(
            F.when(F.col("o_orderkey") % 7 == 0, F.lit("F")).otherwise(
                F.col("o_orderstatus")
            )
        ).alias("h_b"),
    )
    j = a.join(b, "k", "full_outer")
    return j.agg(
        F.sum(F.col("h_a").isNull().cast("int")).cast("bigint").alias("n_added"),
        F.sum(F.col("h_b").isNull().cast("int")).cast("bigint").alias("n_removed"),
        F.sum(
            (F.col("h_a").isNotNull() & F.col("h_b").isNotNull()
             & (F.col("h_a") != F.col("h_b"))).cast("int")
        ).cast("bigint").alias("n_changed"),
        F.sum((F.col("h_a") == F.col("h_b")).cast("int")).cast("bigint").alias("n_unchanged"),
    )


@query(
    "referential_integrity_gate",
    oracle="""
    SELECT
      CAST((SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
        AS orphan_orders,
      CAST((SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
        AS orphan_lineitems,
      CAST((SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                                  GROUP BY o_orderkey HAVING COUNT(*) > 1) d)
           AS BIGINT) AS dup_order_keys,
      CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0) AS BIGINT)
        AS nonpositive_totals
    """,
)
def referential_integrity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate a pipeline runs before publishing a snapshot:
    orphaned foreign keys (anti-joins — the fact side shuffles only its
    key column), primary-key uniqueness (two-stage count), and a domain
    check, all in one row. Anti-join against the customer dim broadcasts;
    the lineitem->orders orphan check shuffles (key) pairs only. All
    four violation counts are zero on healthy TPC-H-shaped data — the
    gate's pass state — and the oracle pins that they are COMPUTED, not
    assumed."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    l = load_table(spark, sf_dir, "lineitem")
    orphan_orders = (
        o.select("o_custkey")
        .join(F.broadcast(c.select("c_custkey")), o["o_custkey"] == c["c_custkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_orders"))
    )
    orphan_line = (
        l.select("l_orderkey")
        .join(o.select("o_orderkey"), l["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_lineitems"))
    )
    dups = (
        o.groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.count(F.lit(1)).cast("bigint").alias("dup_order_keys"))
    )
    domain = o.where(F.col("o_totalprice") <= 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("nonpositive_totals")
    )
    return (
        orphan_orders.crossJoin(F.broadcast(orphan_line))
        .crossJoin(F.broadcast(dups))
        .crossJoin(F.broadcast(domain))
    )
