"""Wide analytic join/aggregation shapes (TPC-H Q8/Q10/Q11/Q12/Q13/Q14/
Q15/Q17/Q19 adapted to this schema — no partsupp, no shipmode/commit/
receipt dates, so the Q11/Q12/Q17 shapes keep their plan structure but
read the columns this testdata has).

These exist to pin the planner behaviors that matter at 100 TB: deep join
reordering with pre-pruned dimensions, conditional-aggregation ratios,
correlated scalar subqueries rewritten to aggregate-joins, disjunctive
mixed-side predicates, left-outer + two-level aggregation, and
HAVING-vs-global-scalar pruning. Money math follows the cross-engine
determinism rules in ``_util`` (exact DECIMAL sums, one final double
cast/division).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cses2humio_spark.queries._util import frac, money, sum_money
from cses2humio_spark.queries.registry import query
from cses2humio_spark.sources.catalog import load_table

_DEC1 = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _rev() -> F.Column:
    one = F.lit(1).cast("decimal(3,2)")
    return money("l_extendedprice") * (one - frac("l_discount"))


@query(
    "promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_DEC1}
                                      ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
           / CAST(SUM({_DEC1}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact-dim join feeding a conditional-aggregation
    ratio (share of promo-part revenue in a ship-date window). The date
    filter is pushed into the lineitem scan; part (2k rows, and only
    p_partkey/p_type after pruning) broadcasts, so the whole query is one
    scan + broadcast-hash join + a single-row aggregate — no shuffle of
    the fact at any width. Both SUMs ride one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = _rev()
    zero = F.lit(0).cast("decimal(14,4)")
    j = li.join(F.broadcast(p), p["p_partkey"] == li["l_partkey"])
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                "double"
            )
            / F.sum(rev).cast("double")
        ).alias("promo_revenue")
    )


@query(
    "small_quantity_avg_yearly",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                      / COUNT(l_quantity))
        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def small_quantity_avg_yearly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: a correlated per-part scalar subquery (20% of the
    part's average quantity) gating a fact filter. Rewritten the way
    Catalyst would: semi-reduce lineitem to the brand's parts via a
    broadcast of the pruned dimension FIRST, compute the per-part average
    once over that reduced set (identical to the correlated average — the
    partkey join keeps every lineitem row of those parts), broadcast the
    tiny aggregate back, filter, and take one global sum. Only the
    semi-reduced fact shuffles (once, for the per-part aggregate); the
    probe side never does — both joins are broadcast-hash. The average is an
    exact decimal sum over one double division, so the threshold compare
    is bit-identical to the DuckDB oracle."""
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
                / F.count("l_quantity")
            )
        ).alias("__qty_cap")
    )
    return (
        li.join(F.broadcast(per_part), F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qty_cap"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "disjunctive_brand_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DEC1}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR-of-ANDs predicate mixing columns from both
    join sides. Catalyst's CNF conversion extracts the part-only residue
    (brand/size disjunction) and pushes it into the part scan, so only
    qualifying parts are broadcast; the quantity conjuncts stay as the
    join's residual filter. The equi-key join stays broadcast-hash — the
    disjunction never degrades it to a nested-loop."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "returned_item_losses",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({_DEC1}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter — a
    4-table join (two facts + two dims), grouped by customer, top 20.
    The returnflag and date filters are pushed into both fact scans
    before the orderkey join (the one real shuffle); customer and nation
    broadcast onto the aggregated stream. Top-20 is TakeOrdered — no
    global sort. Unique c_custkey tiebreak keeps LIMIT deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "top_revenue_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_DEC1}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: a derived revenue-per-supplier relation used twice
    — once as the join input, once under MAX in an uncorrelated scalar
    subquery. The aggregate is computed from one fact shuffle; the max
    compares EXACT decimals (no double round-trip), so ties and the
    boundary row are engine-independent, and the winner row joins the
    supplier dim by broadcast."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_rev")
    )
    rev.createOrReplaceTempView("__q15_revenue")
    s = load_table(spark, sf_dir, "supplier")
    s.createOrReplaceTempView("__q15_supplier")
    return spark.sql(
        """
        SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        FROM __q15_supplier JOIN __q15_revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT MAX(total_rev) FROM __q15_revenue)
        ORDER BY s_suppkey
        """
    )


@query(
    "order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count histogram — a left-outer join
    whose non-key predicate lives in the JOIN condition (an urgent order
    must not null out its customer, it must just not count), then two
    stacked aggregations. COUNT(o_orderkey) counts non-null matches only,
    so customers with zero qualifying orders land in the c_count=0
    bucket. First agg shuffles on custkey; the second input is at most
    one row per distinct count — trivially small."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "market_share_by_year",
    oracle=f"""
    SELECT o_year,
      CAST(CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year, {_DEC1} AS volume,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer,
           nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO') all_nations
    GROUP BY o_year ORDER BY o_year
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of promo-part revenue
    sold into AMERICA, per order year — an 8-relation join with nation
    used under two roles (customer side pruned through region; supplier
    side kept as the share dimension). Every dimension broadcasts after
    pruning, so the only shuffle is lineitem→orders on orderkey; the
    conditional-share numerator and denominator ride one aggregate. The
    region restriction prunes the customer-side nations BEFORE the fact
    join (semi-reduction), which is the order a cost-based planner picks
    at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = (
        n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(F.col("n_nationkey").alias("__cust_nk"))
    )
    n2 = n.select(
        F.col("n_nationkey").alias("__supp_nk"), F.col("n_name").alias("nation")
    )
    zero = F.lit(0).cast("decimal(14,4)")
    joined = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("__cust_nk"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__supp_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            "nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "part_value_concentration",
    oracle=f"""
    SELECT l_partkey, CAST(SUM({_DEC1}) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(SUM({_DEC1}) AS DOUBLE)
         > (SELECT CAST(SUM({_DEC1}) AS DOUBLE) * 1.5
              / COUNT(DISTINCT l_partkey) FROM lineitem)
    ORDER BY part_value DESC, l_partkey
    """,
)
def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp-free): parts whose revenue exceeds
    1.5× the MEAN part revenue — a grouped aggregate filtered against
    an uncorrelated global-scalar subquery. The threshold is a multiple
    of the mean rather than TPC-H's fixed fraction of the total
    (VERDICT r11 #4): a fixed fraction shrinks per part as the corpus
    grows, so at some scale factor the query silently returns ZERO rows
    and its oracle pass proves nothing about the HAVING boundary; the
    mean-relative threshold is scale-invariant (2/29/252 survivors at
    sf0.001/0.01/0.1). Spark plans the scalar as a one-row subquery
    whose result is injected into the HAVING filter (no join operator
    at all) — the fact shuffles once for the per-part aggregate, and
    the total re-reads the same pushed-down scan. Both sides of the
    compare are the same exact-decimal sum cast to double with one
    IEEE multiply and divide in the same order — bit-identical across
    engines, so the threshold boundary can't flake."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("__q11_lineitem")
    return spark.sql(
        f"""
        SELECT l_partkey, CAST(SUM({_DEC1}) AS DOUBLE) AS part_value
        FROM __q11_lineitem
        GROUP BY l_partkey
        HAVING CAST(SUM({_DEC1}) AS DOUBLE)
             > (SELECT CAST(SUM({_DEC1}) AS DOUBLE) * 1.5
                  / COUNT(DISTINCT l_partkey) FROM __q11_lineitem)
        ORDER BY part_value DESC, l_partkey
        """
    )


@query(
    "lateral_top_orders_per_segment",
    oracle="""
    SELECT c_mktsegment, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM (SELECT DISTINCT c_mktsegment FROM customer) segs,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE customer.c_mktsegment = segs.c_mktsegment
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) top_orders
    ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey
    """,
)
def lateral_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: for each market segment, its three
    priciest orders — the per-group top-k written as a lateral join
    instead of a window. Catalyst decorrelates the LATERAL into a
    DomainJoin and plans the per-domain LIMIT as a partitioned top-k
    (rank filter), so no per-segment re-scan of orders happens; the
    unique o_orderkey tiebreak keeps the LIMIT deterministic."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("__lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("__lat_orders")
    return spark.sql(
        """
        SELECT segs.c_mktsegment, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice
        FROM (SELECT DISTINCT c_mktsegment FROM __lat_customer) segs,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM __lat_orders JOIN __lat_customer ON o_custkey = c_custkey
          WHERE __lat_customer.c_mktsegment = segs.c_mktsegment
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) top_orders
        ORDER BY segs.c_mktsegment, o_totalprice DESC, o_orderkey
        """
    )


@query(
    "priority_line_counts",
    oracle="""
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode-free): lines per return flag split into
    high/low order-priority counts — a fact-fact equi-join with the year
    filter pushed into the lineitem scan, feeding CASE-conditional
    counts. Both counts ride one aggregate over the join output; the
    orderkey join is the single shuffle."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
           GROUP BY e.user_id)
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_view,
      CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_view_click,
      CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_view_click_purchase,
      ROUND((SELECT COUNT(*) FROM s2)
            / CAST((SELECT COUNT(*) FROM s1) AS DOUBLE), 6) AS click_rate,
      ROUND((SELECT COUNT(*) FROM s3)
            / CAST(greatest((SELECT COUNT(*) FROM s2), 1) AS DOUBLE), 6)
        AS purchase_rate
    """,
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (view -> click -> purchase): users who
    performed each stage STRICTLY AFTER their earliest completion of the
    previous stage, with stage-to-stage conversion rates — the
    match-sequence analytics every product/SIEM pipeline runs.

    Shape: three per-user MIN aggregations chained by joins on user_id.
    Each stage frame is at most |users| rows, so stages 2 and 3 join a
    shrinking user set back to the (pushed-filtered) event scan; all
    shuffles carry (user_id, one timestamp). No windows, no per-user
    event arrays — history length per user only affects the scan."""
    ev = load_table(spark, sf_dir, "events")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count(F.lit(1)).cast("bigint").alias("n_view"))
    c2 = s2.agg(F.count(F.lit(1)).cast("bigint").alias("n_view_click"))
    c3 = s3.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_view_click_purchase")
    )
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .select(
            "n_view",
            "n_view_click",
            "n_view_click_purchase",
            F.round(
                F.col("n_view_click") / F.col("n_view").cast("double"), 6
            ).alias("click_rate"),
            F.round(
                F.col("n_view_click_purchase")
                / F.greatest(F.col("n_view_click"), F.lit(1)).cast("double"),
                6,
            ).alias("purchase_rate"),
        )
    )


@query(
    "weekly_retention",
    oracle="""
    WITH fu AS (SELECT user_id,
                  CAST(FLOOR(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_week
                FROM events GROUP BY user_id),
    act AS (SELECT DISTINCT user_id,
              CAST(FLOOR(epoch(ts) / 604800) AS BIGINT) AS week
            FROM events)
    SELECT fu.cohort_week,
      CAST(COUNT(DISTINCT fu.user_id) AS BIGINT) AS cohort_size,
      CAST(COUNT(DISTINCT CASE WHEN a.week = fu.cohort_week + 1
                               THEN a.user_id END) AS BIGINT) AS retained_w1,
      CAST(COUNT(DISTINCT CASE WHEN a.week = fu.cohort_week + 2
                               THEN a.user_id END) AS BIGINT) AS retained_w2,
      CAST(COUNT(DISTINCT CASE WHEN a.week = fu.cohort_week + 4
                               THEN a.user_id END) AS BIGINT) AS retained_w4
    FROM fu JOIN act a ON a.user_id = fu.user_id
    GROUP BY fu.cohort_week
    """,
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen epoch-week, with the
    count still active 1 / 2 / 4 weeks later. Cohorting uses integer
    epoch-week arithmetic (engine-portable, timezone-free). Shape: one
    per-user MIN (cohort), one distinct (user, week) activity table —
    both bounded by |users| x |weeks|, not event volume — joined on
    user_id and re-aggregated per cohort."""
    ev = load_table(spark, sf_dir, "events")
    week = lambda c: F.floor(F.unix_timestamp(c) / 604800).cast("bigint")  # noqa: E731
    fu = ev.groupBy("user_id").agg(week(F.min("ts")).alias("cohort_week"))
    act = ev.select("user_id", week(F.col("ts")).alias("week")).distinct()
    j = fu.join(act, "user_id")
    return j.groupBy("cohort_week").agg(
        F.count_distinct("user_id").cast("bigint").alias("cohort_size"),
        F.count_distinct(
            F.when(F.col("week") == F.col("cohort_week") + 1, F.col("user_id"))
        )
        .cast("bigint")
        .alias("retained_w1"),
        F.count_distinct(
            F.when(F.col("week") == F.col("cohort_week") + 2, F.col("user_id"))
        )
        .cast("bigint")
        .alias("retained_w2"),
        F.count_distinct(
            F.when(F.col("week") == F.col("cohort_week") + 4, F.col("user_id"))
        )
        .cast("bigint")
        .alias("retained_w4"),
    )


@query(
    "timed_funnel_completions",
    oracle="""
    WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'signup' GROUP BY user_id),
    s2 AS (SELECT e.user_id, MIN(e.ts) AS t2
           FROM events e JOIN s1 ON s1.user_id = e.user_id
           WHERE e.event_type = 'click' AND e.ts > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, MIN(e.ts) AS t3
           FROM events e JOIN s2 ON s2.user_id = e.user_id
           WHERE e.event_type = 'purchase' AND e.ts > s2.t2
           GROUP BY e.user_id)
    SELECT s1.user_id,
           CAST(FLOOR(epoch(s1.t1)) AS BIGINT) AS t1_s,
           CAST(FLOOR(epoch(s3.t3)) AS BIGINT) AS t3_s,
           CAST(FLOOR(epoch(s3.t3)) - FLOOR(epoch(s1.t1)) AS BIGINT)
             AS duration_s
    FROM s1 JOIN s3 ON s3.user_id = s1.user_id
    WHERE FLOOR(epoch(s3.t3)) - FLOOR(epoch(s1.t1)) <= 7 * 86400
    """,
)
def timed_funnel_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-BOUNDED ordered-sequence detection (the SIEM correlation-rule
    shape: "signup, then click, then purchase, all within 7 days"): the
    strict-order chained-MIN funnel of ``funnel_conversion`` plus a
    window constraint on first-to-last, emitting one row per completing
    user with the chain duration. Same scale shape — three per-user MIN
    aggregations, shuffles carry (user_id, timestamp) only."""
    ev = load_table(spark, sf_dir, "events")
    s1 = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    out = s1.join(s3, "user_id").select(
        "user_id",
        F.unix_timestamp("t1").cast("bigint").alias("t1_s"),
        F.unix_timestamp("t3").cast("bigint").alias("t3_s"),
        (
            F.unix_timestamp("t3").cast("bigint")
            - F.unix_timestamp("t1").cast("bigint")
        ).alias("duration_s"),
    )
    return out.filter(F.col("duration_s") <= 7 * 86400)
