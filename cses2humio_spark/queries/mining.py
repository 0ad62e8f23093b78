"""Data-mining / statistics query family: fuzzy record matching, closed-form
regression, time-series interpolation, equi-depth histograms, SCD2 change
history, PageRank, and bitmap-prefiltered semi-joins.

The reference delegates all analytics to Humio (SURVEY.md §2.3 — the
connector itself has zero relational operators); these queries extend the
engine-target surface (SURVEY.md §2.2) with the operations a security- or
training-data team layers on once the basics exist: entity resolution
(fuzzy match), trend fitting (regression), gap repair (interpolation),
drift history (SCD2), and graph centrality (PageRank).

Determinism contract (registry docstring): float expressions that must be
compared across engines are either (a) computed from exact DECIMAL
aggregates and then evaluated with textually identical scalar expressions
on both sides (same IEEE ops in the same order → bit-identical), or
(b) rounded through exact decimals per iteration (PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cses2humio_spark.queries.registry import query
from cses2humio_spark.sources.catalog import load_table

# --- fuzzy matching ------------------------------------------------------


@query(
    "fuzzy_name_match_pairs",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    q AS (SELECT p_name, split_part(p_name, ' ', 1) AS tok1,
                 length(p_name) AS ln
          FROM names)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance
    FROM q a JOIN q b
      ON a.tok1 = b.tok1
     AND a.p_name < b.p_name
     AND abs(a.ln - b.ln) <= 2
     AND levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def fuzzy_name_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (entity resolution) over part names:
    candidate pairs share a blocking key (first token) and a length band
    (±2), and survive if Levenshtein ≤ 3. The blocking key turns an
    O(n²) all-pairs edit-distance into an equi-join whose residual
    (length band + edit distance) runs only on same-block candidates —
    at 100 TB the edit distance never sees the cross product, and the
    match runs over DISTINCT values (64 here vs 2000 rows), which is the
    real-world shape: dedupe the value dictionary, then map back."""
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    q = names.select(
        "p_name",
        F.split("p_name", " ").getItem(0).alias("tok1"),
        F.length("p_name").alias("ln"),
    )
    a = q.select(
        F.col("p_name").alias("name_a"),
        F.col("tok1").alias("t1"),
        F.col("ln").alias("ln_a"),
    )
    b = q.select(
        F.col("p_name").alias("name_b"),
        F.col("tok1").alias("t2"),
        F.col("ln").alias("ln_b"),
    )
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(
            b,
            (F.col("t1") == F.col("t2"))
            & (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= 2)
            & (dist <= 3),
        )
        .select("name_a", "name_b", dist.cast("bigint").alias("edit_distance"))
    )


# --- closed-form regression ----------------------------------------------

# Identical scalar-expression text evaluated by BOTH engines on the exact
# decimal aggregates — same IEEE ops in the same order, bit-identical out.
_REG_EXPRS = [
    "ROUND((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope",
    "ROUND((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 6) AS intercept",
    "ROUND(((n*sxy - sx*sy) * (n*sxy - sx*sy)) / "
    "((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS r2",
    "ROUND((n*sxy - sx*sy) / SQRT((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS corr",
]


@query(
    "price_quantity_regression",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(q) AS DOUBLE) AS sx,
             CAST(SUM(p) AS DOUBLE) AS sy,
             CAST(SUM(q * q) AS DOUBLE) AS sxx,
             CAST(SUM(p * p) AS DOUBLE) AS syy,
             CAST(SUM(q * p) AS DOUBLE) AS sxy
      FROM (SELECT l_returnflag,
                   CAST(l_quantity AS DECIMAL(12,2)) AS q,
                   CAST(l_extendedprice AS DECIMAL(18,2)) AS p
            FROM lineitem) t
      GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           {", ".join(_REG_EXPRS)}
    FROM s
    """,
)
def price_quantity_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form OLS (extendedprice ~ quantity) per return flag: slope,
    intercept, R², Pearson corr — all from ONE pass of six exact-DECIMAL
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy). This is how
    regression runs at 100 TB: the shuffle carries six partial sums per
    group, never the points; the normal equations are a driver-side-free
    scalar projection. The built-in ``regr_slope`` family accumulates
    doubles (partitioning-order-dependent); the exact-decimal route is
    bit-reproducible under any partitioning, which is what makes it
    oracle-checkable."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("decimal(12,2)")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("sx"),
        F.sum(p).cast("double").alias("sy"),
        F.sum(q * q).cast("double").alias("sxx"),
        F.sum(p * p).cast("double").alias("syy"),
        F.sum(q * p).cast("double").alias("sxy"),
    )
    return stats.selectExpr(
        "l_returnflag", "CAST(n AS BIGINT) AS n_rows", *_REG_EXPRS
    )


# --- time-series gap repair ----------------------------------------------

_INTERP_EXPR = (
    "ROUND(CASE WHEN v IS NOT NULL THEN v "
    "ELSE pv + (nv - pv) * ((h_s - ph_s) / (nh_s - ph_s)) END, 6)"
)


@query(
    "interpolated_hourly_value",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
      FROM events GROUP BY 1, 2),
    span AS (SELECT event_type, MIN(h) AS h0, MAX(h) AS h1
             FROM hourly GROUP BY 1),
    spine AS (SELECT event_type,
                     UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
              FROM span),
    base AS (SELECT s.event_type, s.h, hr.v
             FROM spine s LEFT JOIN hourly hr
               ON hr.event_type = s.event_type AND hr.h = s.h),
    win AS (SELECT event_type, h, v,
      LAST_VALUE(v IGNORE NULLS) OVER
        (PARTITION BY event_type ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
      CAST(FLOOR(epoch(LAST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        OVER (PARTITION BY event_type ORDER BY h
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))) AS BIGINT) AS ph_s,
      FIRST_VALUE(v IGNORE NULLS) OVER
        (PARTITION BY event_type ORDER BY h
         ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
      CAST(FLOOR(epoch(FIRST_VALUE(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
        OVER (PARTITION BY event_type ORDER BY h
              ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))) AS BIGINT) AS nh_s,
      CAST(FLOOR(epoch(h)) AS BIGINT) AS h_s
      FROM base)
    SELECT event_type, h_s AS hour_ts,
           {_INTERP_EXPR} AS value_filled,
           CAST(v IS NULL AS INTEGER) AS is_interpolated
    FROM win
    """,
)
def interpolated_hourly_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly mean value per event type with LINEAR
    interpolation across missing hours (42 of 720 hours have no error
    event at sf0.01): densify each series onto its own hour spine
    (sequence + explode), then carry the nearest present neighbors with
    frame-bounded ignore-nulls window functions and interpolate by the
    time fraction. The windows partition by series key — at 100 TB each
    series sorts independently after one shuffle on event_type; the spine
    join is an equi-join on (type, hour). The hourly mean is an exact
    decimal sum over count, and the interpolation arithmetic is the same
    textual expression on both engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    span = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    spine = span.select(
        "event_type",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    base = spine.join(hourly, ["event_type", "h"], "left")
    prev_f = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    next_f = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    present_h = F.when(F.col("v").isNotNull(), F.col("h"))
    win = base.select(
        "event_type",
        "v",
        F.last("v", ignorenulls=True).over(prev_f).alias("pv"),
        F.unix_timestamp(F.last(present_h, ignorenulls=True).over(prev_f))
        .cast("bigint")
        .alias("ph_s"),
        F.first("v", ignorenulls=True).over(next_f).alias("nv"),
        F.unix_timestamp(F.first(present_h, ignorenulls=True).over(next_f))
        .cast("bigint")
        .alias("nh_s"),
        F.unix_timestamp("h").cast("bigint").alias("h_s"),
    )
    return win.selectExpr(
        "event_type",
        "h_s AS hour_ts",
        f"{_INTERP_EXPR} AS value_filled",
        "CAST(v IS NULL AS INTEGER) AS is_interpolated",
    )


# --- equi-depth histogram -------------------------------------------------


@query(
    "equi_depth_price_histogram",
    oracle="""
    WITH b AS (SELECT o_totalprice,
                      CAST(NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey)
                           AS INTEGER) AS bucket
               FROM orders)
    SELECT bucket, COUNT(*) AS n_orders,
           MIN(o_totalprice) AS price_lo,
           MAX(o_totalprice) AS price_hi,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_price
    FROM b GROUP BY bucket
    """,
)
def equi_depth_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (8 equal-count buckets) of order totals via
    NTILE over a total order (price, key — the key breaks ties so bucket
    assignment is engine-identical). Min/max per bucket are exact doubles
    (no summation); the mean is an exact-decimal sum over count.

    Scale note: an un-partitioned NTILE is a single-reducer sort — fine
    for ≤ fan-in of one executor, but at 100 TB the equi-depth boundaries
    come from ``approx_percentile`` (one pass, mergeable sketch) and rows
    are bucketed by comparing against the broadcast boundary array; this
    exact form is registered because it is oracle-checkable and defines
    the semantics the approximate plan approximates."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    b = orders.select(
        "o_totalprice", F.ntile(8).over(w).cast("int").alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("price_lo"),
        F.max("o_totalprice").alias("price_hi"),
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_price"),
    )


# --- SCD2 change history --------------------------------------------------


@query(
    "scd2_user_status_history",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS status, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    chg AS (SELECT user_id, status, ts, event_id FROM seq
            WHERE prev IS NULL OR prev <> status),
    iv AS (SELECT user_id, status,
                  epoch_us(ts) AS valid_from_us,
                  LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS valid_to_us,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS version
           FROM chg)
    SELECT user_id, status, valid_from_us, valid_to_us,
           CAST(version AS BIGINT) AS version,
           CAST(valid_to_us IS NULL AS INTEGER) AS is_current
    FROM iv
    """,
)
def scd2_user_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history build (CDC collapse): per
    user, consecutive duplicate statuses collapse to one versioned
    validity interval [valid_from, valid_to) in epoch microseconds; the
    open interval is the current row. Ordering ties on ts break by
    event_id so the change sequence is total and engine-identical. Two
    windows over the SAME (user_id, ts, event_id) sort order — one
    shuffle on user_id, both windows reuse it; the interval build touches
    only change rows (~4/5 of events here, far fewer in real CDC)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        F.col("event_type").alias("status"),
        "ts",
        "event_id",
        F.lag("event_type").over(w).alias("prev"),
    )
    chg = seq.where(F.col("prev").isNull() | (F.col("prev") != F.col("status")))
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = chg.select(
        "user_id",
        "status",
        F.unix_micros("ts").alias("valid_from_us"),
        F.lead(F.unix_micros("ts")).over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("bigint").alias("version"),
    )
    return iv.select(
        "user_id",
        "status",
        "valid_from_us",
        "valid_to_us",
        "version",
        F.col("valid_to_us").isNull().cast("int").alias("is_current"),
    )


# --- PageRank -------------------------------------------------------------


def _pr_iter(i: int, prev: str, nxt: str) -> str:
    return f"""
    m{i} AS (SELECT a.dst AS node,
                    CAST(SUM(CAST(ROUND(p.r * a.w / o.ow, 12)
                                  AS DECIMAL(26,12))) AS DOUBLE) AS mass
             FROM agg a JOIN {prev} p ON p.node = a.src
                        JOIN outw o ON o.src = a.src
             GROUP BY a.dst),
    {nxt} AS (SELECT n.node,
                     ROUND((1.0 - 0.85) / (SELECT COUNT(*) FROM nodes)
                           + 0.85 * COALESCE(m.mass, 0.0), 12) AS r
              FROM nodes n LEFT JOIN m{i} m ON m.node = n.node)"""


@query(
    "event_type_pagerank",
    oracle=f"""
    WITH seq AS (SELECT event_type AS src,
                        LEAD(event_type) OVER (PARTITION BY user_id
                                               ORDER BY ts, event_id) AS dst
                 FROM events),
    agg AS (SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
            FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
    nodes AS (SELECT src AS node FROM agg UNION SELECT dst FROM agg),
    outw AS (SELECT src, SUM(w) AS ow FROM agg GROUP BY 1),
    r0 AS (SELECT node, ROUND(1.0 / (SELECT COUNT(*) FROM nodes), 12) AS r
           FROM nodes),
    {_pr_iter(1, "r0", "r1")},
    {_pr_iter(2, "r1", "r2")},
    {_pr_iter(3, "r2", "r3")}
    SELECT node, r AS pagerank FROM r3
    """,
)
def event_type_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 synchronous iterations, damping 0.85) over the
    event-type transition graph — the second iterative algorithm in the
    engine after k-means, built on the same determinism contract: each
    edge contribution is rounded into an exact DECIMAL before the
    per-node sum, so ranks are bit-identical under any partitioning and
    the oracle can unroll the iterations as CTE pairs. The graph here is
    small (5 types) but the operator's per-iteration shape — one
    ranks⋈edges equi-join plus one groupBy(dst) partial sum — carries
    O(|E|) ids+doubles per iteration and keeps ranks distributed, which
    is the billion-node layout (operators/graph.py scale notes)."""
    from cses2humio_spark.operators.graph import pagerank

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    edges = seq.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("w")
    )
    ranks = pagerank(edges, "src", "dst", weight="w", n_iter=3, damping=0.85)
    return ranks.select("node", F.col("rank").alias("pagerank"))


# --- bitmap-prefiltered semi-join ----------------------------------------


@query(
    "bitmap_pruned_brand_revenue",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#7')
    GROUP BY l_returnflag
    """,
)
def bitmap_pruned_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of one brand's lineitems computed through
    ``bitmap_prefilter_semi_join``: the brand's part keys are hashed into
    a 16 Ki-bit broadcast bitmap that prunes the lineitem side MAP-SIDE
    (codegen bit arithmetic on a literal array) before the exact semi-join
    — the manual twin of Spark's runtime Bloom filter, with the result
    contract that it is row-identical to the plain semi-join the oracle
    runs. At 100 TB the join shuffle carries only probable matches
    (~1/25 of rows here); tests/test_mining.py pins the pruning factor
    and the exactness equivalence."""
    from cses2humio_spark.operators.joins import bitmap_prefilter_semi_join
    from cses2humio_spark.queries._util import frac, money

    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#7"
    )
    one = F.lit(1).cast("decimal(3,2)")
    sj = bitmap_prefilter_semi_join(
        li, parts, "l_partkey", "p_partkey", n_bits=16384
    )
    return sj.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(money("l_extendedprice") * (one - frac("l_discount")))
        .cast("double")
        .alias("revenue"),
    )


# --- heavy hitters --------------------------------------------------------


@query(
    "heavy_hitter_users",
    oracle="""
    SELECT user_id, COUNT(*) AS n_rows
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) * 200 > (SELECT COUNT(*) FROM events)
    """,
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with more than n/200 of all events, found EXACTLY through
    the bounded-memory Misra-Gries path (``operators/sketches.py``):
    per-partition candidate summaries of at most 200 counters, then an
    exact count restricted to candidates. A plain groupBy gives the same
    answer until the distinct-key count outgrows executor memory — the
    sketch path is the 100 TB insurance, and registering it against the
    plain-SQL oracle proves the candidate set never loses a true heavy
    hitter."""
    from cses2humio_spark.operators.sketches import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "user_id", 200)


# --- beaconing / inter-arrival regularity ---------------------------------

# identical scalar-expression text on both engines (exact-decimal sums →
# double), same trick as _REG_EXPRS: mean gap, and the coefficient of
# variation sqrt(var)/mean — the beaconing score (C2 implants poll on
# timers → cv near 0; organic human activity → cv near 1)
_BEACON_EXPRS = [
    "CAST(n AS BIGINT) AS n_gaps",
    "ROUND(sg / n / 1000000.0, 3) AS mean_gap_s",
    "ROUND(SQRT((sg2 - sg*sg/n) / n) / (sg / n), 6) AS cv",
]


@query(
    "beacon_regularity_scores",
    oracle=f"""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM events),
    s AS (SELECT user_id,
                 COUNT(g) AS n,
                 CAST(SUM(CAST(g AS DECIMAL(19,0))) AS DOUBLE) AS sg,
                 CAST(SUM(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0)))
                      AS DOUBLE) AS sg2
          FROM gaps WHERE g IS NOT NULL
          GROUP BY user_id
          HAVING COUNT(g) >= 30)
    SELECT user_id, {", ".join(_BEACON_EXPRS)} FROM s
    """,
)
def beacon_regularity_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Beaconing detection (the security-analytics classic the reference's
    users run in Humio): per-user inter-arrival gaps, then the
    coefficient of variation of the gap distribution from exact-DECIMAL
    sufficient statistics (Σg and Σg² are integer-microsecond sums — g²
    overflows BIGINT, hence exact decimals). A timer-driven implant scores
    cv ≈ 0, organic activity cv ≈ 1; the fixture's Poisson-ish arrivals
    land near 1 and the full score table is oracle-checked bit-exactly.
    One window + one agg: a single shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gaps = ev.select(
        "user_id", (us - F.lag(us).over(w)).alias("g")
    ).where(F.col("g").isNotNull())
    gd = F.col("g").cast("decimal(19,0)")
    s = (
        gaps.groupBy("user_id")
        .agg(
            F.count("g").alias("n"),
            F.sum(gd).cast("double").alias("sg"),
            F.sum(gd * gd).cast("double").alias("sg2"),
        )
        .filter(F.col("n") >= 30)
    )
    return s.selectExpr("user_id", *_BEACON_EXPRS)


# --- robust statistics ----------------------------------------------------


@query(
    "mad_outliers_by_type",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS ad
      FROM events e JOIN med m ON m.event_type = e.event_type),
    mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(ANY_VALUE(d.med), 6) AS median_value,
           ROUND(ANY_VALUE(m.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.ad > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type
    """,
)
def mad_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via Median Absolute Deviation: per event
    type, the median, the MAD, and the count of values beyond the
    3-sigma-equivalent robust threshold (1.4826·MAD ≈ σ under
    normality). Unlike the mean/stddev z-score (``value_outliers_by_type``)
    a single extreme value cannot drag the threshold — the estimator has
    a 50% breakdown point, which is what anomaly hunts over dirty machine
    data need. Two grouped exact-percentile passes + one counting pass;
    medians are interpolated identically on both engines, and the
    threshold comparison is pure per-row double arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.first("mad"), 6).alias("mad"),
            F.sum(
                (F.col("ad") > 3 * 1.4826 * F.col("mad")).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "seasonal_baseline_deviations",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    keyed AS (
      SELECT event_type, h, n,
             CAST(dayofweek(h) + 1 AS INTEGER) AS dow,  -- DuckDB 0=Sun..6; Spark 1=Sun..7
             CAST(hour(h) AS INTEGER) AS hod
      FROM hourly),
    base AS (
      SELECT event_type, dow, hod,
             COUNT(*) AS n_obs,
             CAST(SUM(CAST(n AS DECIMAL(19,0))) AS DOUBLE) AS sn,
             CAST(SUM(CAST(n AS DECIMAL(19,0)) * CAST(n AS DECIMAL(19,0)))
                  AS DOUBLE) AS sn2
      FROM keyed GROUP BY 1, 2, 3)
    SELECT k.event_type, k.dow, k.hod,
           CAST(b.n_obs AS BIGINT) AS n_obs,
           ROUND(b.sn / b.n_obs, 6) AS baseline,
           CAST(SUM(CASE WHEN b.n_obs >= 3
                          AND abs(k.n - b.sn / b.n_obs) >
                              3 * SQRT((b.sn2 - b.sn*b.sn/b.n_obs) / b.n_obs)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous
    FROM keyed k JOIN base b
      ON b.event_type = k.event_type AND b.dow = k.dow AND b.hod = k.hod
    GROUP BY k.event_type, k.dow, k.hod, b.n_obs, b.sn, b.sn2
    """,
)
def seasonal_baseline_deviations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal (hour-of-week) traffic baseline + anomaly count: hourly
    event counts keyed by (type, day-of-week, hour-of-day), a per-slot
    baseline mean/σ from exact-decimal sufficient statistics, and the
    number of weeks whose observation deviates > 3σ from its own slot's
    baseline. This is the alerting shape that survives daily/weekly
    seasonality where a global z-score drowns: each of the 5x7x24 slots
    gets its own threshold. The σ expression is the same textual scalar
    on both engines (exact sums → double)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    keyed = hourly.select(
        "event_type",
        "h",
        "n",
        F.dayofweek("h").cast("int").alias("dow"),
        F.hour("h").cast("int").alias("hod"),
    )
    nd = F.col("n").cast("decimal(19,0)")
    base = keyed.groupBy("event_type", "dow", "hod").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(nd).cast("double").alias("sn"),
        F.sum(nd * nd).cast("double").alias("sn2"),
    )
    j = keyed.join(base, ["event_type", "dow", "hod"])
    return (
        j.groupBy("event_type", "dow", "hod", "n_obs", "sn", "sn2")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN n_obs >= 3 AND abs(n - sn / n_obs) > "
                    "3 * SQRT((sn2 - sn*sn/n_obs) / n_obs) THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_anomalous")
        )
        .selectExpr(
            "event_type",
            "dow",
            "hod",
            "CAST(n_obs AS BIGINT) AS n_obs",
            "ROUND(sn / n_obs, 6) AS baseline",
            "n_anomalous",
        )
    )


@query(
    "first_seen_user_type_pairs",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type, MIN(ts) AS first_ts
      FROM events GROUP BY user_id, event_type),
    horizon AS (SELECT MAX(ts) AS mx FROM events)
    SELECT f.user_id, f.event_type,
           CAST(FLOOR(epoch(f.first_ts)) AS BIGINT) AS first_seen_s
    FROM firsts f, horizon h
    WHERE f.first_ts > h.mx - INTERVAL 7 DAY
    """,
)
def first_seen_user_type_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-behavior detection (the first-seen hunt every SOC runs): (user,
    event-type) pairs whose FIRST EVER occurrence falls inside the last 7
    days of the data horizon — new admin activity, first-time access to a
    resource class. One groupBy computing per-pair minima (shuffle
    carries (user, type, one timestamp)), one broadcast scalar for the
    horizon; at 100 TB the baseline of known pairs would be the
    incrementally-maintained rollup (docs/RUNBOOK.md) instead of a full
    recompute."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts")
    )
    horizon = ev.agg(F.max("ts").alias("mx"))
    return (
        firsts.join(F.broadcast(horizon))
        .filter(F.col("first_ts") > F.col("mx") - F.expr("INTERVAL 7 DAY"))
        .select(
            "user_id",
            "event_type",
            F.unix_timestamp("first_ts").cast("bigint").alias("first_seen_s"),
        )
    )


# --- behavioral sequence anomaly (Markov log-likelihood) ------------------


@query(
    "markov_sequence_anomaly",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events),
    tr AS (SELECT user_id, src, dst FROM seq WHERE dst IS NOT NULL),
    m AS (SELECT src, dst, COUNT(*) AS n FROM tr GROUP BY src, dst),
    tot AS (SELECT src, SUM(n) AS t FROM m GROUP BY src),
    p AS (SELECT m.src, m.dst,
                 ROUND(LN(m.n / CAST(t.t AS DOUBLE)), 8) AS lp
          FROM m JOIN tot t ON t.src = m.src),
    scored AS (
      SELECT tr.user_id,
             COUNT(*) AS n_tr,
             CAST(SUM(CAST(p.lp AS DECIMAL(28,8))) AS DOUBLE) AS sl
      FROM tr JOIN p ON p.src = tr.src AND p.dst = tr.dst
      GROUP BY tr.user_id
      HAVING COUNT(*) >= 20)
    SELECT user_id, CAST(n_tr AS BIGINT) AS n_transitions,
           ROUND(-sl / n_tr, 6) AS avg_nll
    FROM scored
    """,
)
def markov_sequence_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-sequence anomaly score: each user's event stream is
    scored by its average negative log-likelihood under the GLOBAL
    first-order Markov transition model — users whose action sequences
    are improbable under fleet-wide behavior float to the top (the
    UEBA shape: compromised accounts act unlike the population).

    Determinism: transition probabilities are exact count ratios; each
    log-prob is rounded to 8 before an exact-DECIMAL per-user sum (the
    engine's iterative-algorithm contract), so scores are bit-identical
    under any partitioning. Scale: the model is |types|² rows broadcast
    to the transition stream; per-user state is two numbers."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tr = ev.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    m = tr.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    tot = m.groupBy("src").agg(F.sum("n").alias("t"))
    p = m.join(tot, "src").select(
        "src",
        "dst",
        F.round(F.log(F.col("n") / F.col("t").cast("double")), 8).alias("lp"),
    )
    scored = (
        tr.join(F.broadcast(p), ["src", "dst"])
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_tr"),
            F.sum(F.col("lp").cast("decimal(28,8)")).cast("double").alias("sl"),
        )
        .filter(F.col("n_tr") >= 20)
    )
    return scored.select(
        "user_id",
        F.col("n_tr").cast("bigint").alias("n_transitions"),
        F.round(-F.col("sl") / F.col("n_tr"), 6).alias("avg_nll"),
    )


@query(
    "ewma_user_baseline",
    oracle="""
    WITH s AS (
      SELECT user_id, COUNT(*) AS n,
             list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id),
    f AS (
      SELECT user_id, n, vs[n] AS last_v,
             list_reduce(vs, (acc, v) -> 0.3*v + 0.7*acc) AS ew
      FROM s)
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           ROUND(last_v, 6) AS last_value,
           ROUND(ew, 6) AS ewma,
           ROUND(last_v - ew, 6) AS deviation
    FROM f
    """,
)
def ewma_user_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA baseline (alpha=0.3) over the value series in event
    order, with the newest observation's deviation from it — the UEBA
    'off own baseline' smoother completing the drift family (CUSUM
    catches sustained shift, MAD catches population outliers, EWMA
    scores the newest point against the user's own history). The fold
    runs left-to-right inside aggregate() in both engines, so doubles
    match bit-for-bit."""
    from cses2humio_spark.operators.drift import ewma_final

    ev = load_table(spark, sf_dir, "events")
    return ewma_final(ev, "user_id", ["ts", "event_id"], "value", alpha=0.3)

@query(
    "holt_trend_baseline",
    oracle="""
    WITH s AS (
      SELECT user_id, COUNT(*) AS n,
             list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id HAVING COUNT(*) >= 3),
    hw AS (
      WITH RECURSIVE rec(user_id, i, l, b, f) AS (
        SELECT user_id, 2, vs[2], vs[2] - vs[1], CAST(NULL AS DOUBLE)
        FROM s
        UNION ALL
        SELECT r.user_id, r.i + 1,
               0.3*s2.vs[r.i + 1] + 0.7*(r.l + r.b),
               0.1*((0.3*s2.vs[r.i + 1] + 0.7*(r.l + r.b)) - r.l)
                 + 0.9*r.b,
               r.l + r.b
        FROM rec r JOIN s s2 ON s2.user_id = r.user_id
        WHERE r.i < s2.n)
      SELECT * FROM rec)
    SELECT s.user_id, CAST(s.n AS BIGINT) AS n_events,
           ROUND(s.vs[s.n], 6) AS last_value,
           ROUND(h.l, 6) AS level,
           ROUND(h.b, 6) AS trend,
           ROUND(h.l + h.b, 6) AS forecast_next,
           ROUND(s.vs[s.n] - h.f, 6) AS deviation
    FROM s JOIN hw h ON h.user_id = s.user_id AND h.i = s.n
    """,
)
def holt_trend_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Holt double-exponential baseline (alpha=0.3, beta=0.1):
    level + trend smoothing in event order, with the newest point's
    deviation from the one-step-ahead forecast made BEFORE it — the
    trend-aware sibling of ewma_user_baseline (a steadily climbing
    series is normal to Holt, anomalous to EWMA). The struct-accumulator
    fold runs left-to-right with an IDENTICAL expression tree in both
    engines, so doubles match bit-for-bit."""
    from cses2humio_spark.operators.drift import holt_final

    ev = load_table(spark, sf_dir, "events")
    return holt_final(
        ev, "user_id", ["ts", "event_id"], "value", alpha=0.3, beta=0.1
    )

@query(
    "holt_winters_hourly_baseline",
    oracle="""
    WITH hourly AS (
      SELECT event_type, CAST(FLOOR(epoch(ts)/3600) AS BIGINT) AS hr,
             CAST(SUM(CAST(ROUND(value*100, 0) AS BIGINT)) AS DOUBLE) AS v
      FROM events GROUP BY 1, 2),
    s AS (SELECT event_type, COUNT(*) AS n, list(v ORDER BY hr) AS vs
          FROM hourly GROUP BY 1 HAVING COUNT(*) >= 49),
    init AS (SELECT event_type, n, vs, list_reduce(vs[1:24], (x, y) -> x + y) / 24.0 AS l0,
                    (list_reduce(vs[25:48], (x, y) -> x + y) / 24.0 - list_reduce(vs[1:24], (x, y) -> x + y) / 24.0) / 24.0 AS b0
             FROM s),
    rec AS (
      WITH RECURSIVE r2(event_type, i, l, b, sarr, f) AS (
        SELECT event_type, 24, l0, b0,
               list_transform(vs[1:24], x -> x - l0),
               CAST(NULL AS DOUBLE)
        FROM init
        UNION ALL
        SELECT r.event_type, r.i + 1,
          0.3*(s2.vs[r.i + 1] - r.sarr[((r.i) % 24) + 1]) + 0.7*(r.l + r.b),
          0.1*((0.3*(s2.vs[r.i + 1] - r.sarr[((r.i) % 24) + 1]) + 0.7*(r.l + r.b)) - r.l) + 0.9*r.b,
          list_transform(generate_series(1, 24), j ->
            CASE WHEN j = ((r.i) % 24) + 1
                 THEN 0.2*(s2.vs[r.i + 1] - (0.3*(s2.vs[r.i + 1] - r.sarr[((r.i) % 24) + 1]) + 0.7*(r.l + r.b))) + 0.8*r.sarr[j]
                 ELSE r.sarr[j] END),
          r.l + r.b + r.sarr[((r.i) % 24) + 1]
        FROM r2 r JOIN s s2 ON s2.event_type = r.event_type
        WHERE r.i < s2.n)
      SELECT * FROM r2)
    SELECT s.event_type, CAST(s.n AS BIGINT) AS n_events,
           ROUND(s.vs[s.n], 6) AS last_value,
           ROUND(h.l, 6) AS level,
           ROUND(h.b, 6) AS trend,
           ROUND(h.sarr[(s.n % 24) + 1], 6) AS season_next,
           ROUND(h.l + h.b + h.sarr[(s.n % 24) + 1], 6) AS forecast_next,
           ROUND(s.vs[s.n] - h.f, 6) AS deviation
    FROM s JOIN rec h ON h.event_type = s.event_type AND h.i = s.n
    """,
)
def holt_winters_hourly_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (alpha=0.3, beta=0.1, gamma=0.2, period 24)
    over each event type's hourly cents series — the seasonal member
    completing the smoothing family (EWMA: flat baseline; Holt: trend;
    Holt-Winters: trend + repeating daily profile, the shape ops series
    actually have). The series is the ordered sequence of non-empty
    hourly buckets (integer-exact cents sums); the struct+seasonal-array
    fold runs left-to-right with expression trees written identically in
    the recursive-CTE oracle, so doubles match bit-for-bit."""
    from cses2humio_spark.operators.drift import holt_winters_final

    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "event_type",
            F.floor(F.unix_timestamp(F.col("ts")) / 3600)
            .cast("bigint")
            .alias("hr"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("double")
            .alias("v")
        )
    )
    return holt_winters_final(
        hourly, "event_type", ["hr"], "v", period=24,
        alpha=0.3, beta=0.1, gamma=0.2,
    )

