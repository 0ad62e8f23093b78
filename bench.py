"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line with per-query wall seconds.

Each query is materialized via collect() — the full result crosses the
driver boundary, so scan + shuffle + agg are all on the clock.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "top_shipping_priority",
    "revenue_by_nation",
    "nation_trade_volume",
    "large_order_customers",
    "brand_revenue_broadcast",
    "asof_latest_order",
    "top3_orders_per_customer",
    "timechart_errors",
    "events_range_self_join",
    "sessionize_users",
    "token_explode_top20",
    "distinct_users_per_type",
    "jaccard_near_dups",
    "cosine_topk",
    "embedding_near_dups",
    "ivf_topk",
]

WARMUP_SF_DIR = "/root/testdata/sf0.001"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from cses2humio_spark.session import get_spark
    from cses2humio_spark.queries import QUERIES

    spark = get_spark("bench")
    # baseline JVM warm (always): first action absorbs session startup
    spark.range(1).collect()
    # Warm the plans: run every headline query once at the SMALLEST scale
    # factor (different files than the measured run, so no input caching —
    # this absorbs one-time codegen compilation, Arrow init, and parquet
    # reader setup, which are fixed costs, not per-query work).
    if os.path.isdir(WARMUP_SF_DIR) and os.path.abspath(
        WARMUP_SF_DIR
    ) != os.path.abspath(sf_dir):
        for name in HEADLINE:
            if name in QUERIES:
                QUERIES[name](spark, WARMUP_SF_DIR).collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).collect()
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
