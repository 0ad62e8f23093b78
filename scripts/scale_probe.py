"""Empirical scale check: grow the sf0.1 FACT tables K times into a scratch
dir with per-copy key remapping (so entity cardinality grows with volume —
naively duplicating files duplicates join keys and turns every fact-fact
join into a K^2 row explosion, which measures the synthetic artifact, not
the plan). Dimension tables stay single-copy, as they would at scale.

A query whose runtime grows ~linearly (and whose plan keeps the same shape)
holds its scale posture; superlinear growth flags a join/agg that degrades
with volume. Writes only to /tmp scratch; nothing committed.

Usage: python scripts/scale_probe.py [K]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "pricing_summary",
    "revenue_by_nation",
    "large_order_customers",
    "sole_blame_suppliers",
    "timechart_errors",
    "top3_orders_per_customer",
    "token_explode_top20",
    "distinct_users_per_type",
]
# near-dup probes are intentionally absent: replicated copies are perfect
# duplicates of each other, so the true pair count grows K^2 — the probe
# would measure that synthetic artifact, not the plan (same reason fact
# keys are remapped below).

# fact tables: per-copy shift of the ENTITY keys (order/customer/event/doc
# ids); foreign keys into single-copy dimensions (nationkey, partkey,
# suppkey) are left alone. B is far above any sf0.1 key.
_B = 1_000_000_000
FACT_REMAP = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation", "supplier", "part"]


def replicate(spark, src_dir: str, dst_dir: str, k: int) -> None:
    from pyspark.sql import functions as F

    from cses2humio_spark.sources.catalog import load_table

    for t in DIMS:
        shutil.copytree(
            os.path.join(src_dir, f"{t}.parquet"),
            os.path.join(dst_dir, f"{t}.parquet"),
        ) if os.path.isdir(
            os.path.join(src_dir, f"{t}.parquet")
        ) else shutil.copy(
            os.path.join(src_dir, f"{t}.parquet"),
            os.path.join(dst_dir, f"{t}.parquet"),
        )
    for t, keys in FACT_REMAP.items():
        base = load_table(spark, src_dir, t)
        if t == "events":
            # load_table surfaces ts as TIMESTAMP from int64-nanos parquet;
            # store nanos back so the scratch dir reads through the same path
            base = base.withColumn("ts", (F.unix_micros(F.col("ts")) * 1000))
        dst = os.path.join(dst_dir, f"{t}.parquet")
        for i in range(k):
            df = base
            for key in keys:
                df = df.withColumn(key, F.col(key) + F.lit(i * _B))
            df.write.mode("append").parquet(dst)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from cses2humio_spark.queries import QUERIES
    from cses2humio_spark.session import get_spark

    spark = get_spark("scale_probe")
    base = "/root/testdata/sf0.1"
    scratch = tempfile.mkdtemp(prefix="sgraft_scale_")
    replicate(spark, base, scratch, k)
    print(f"replicated sf0.1 x{k} into {scratch}")

    for name in PROBES:
        fn = QUERIES[name]
        fn(spark, base).collect()  # warm plan
        t0 = time.perf_counter()
        n1 = len(fn(spark, base).collect())
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        nk = len(fn(spark, scratch).collect())
        tk = time.perf_counter() - t0
        ratio = tk / t1 if t1 > 0 else float("inf")
        print(
            f"{name:28s} 1x={t1:6.2f}s ({n1} rows)  {k}x={tk:6.2f}s ({nk} rows)"
            f"  time-ratio={ratio:4.1f} (linear={k}.0)"
        )
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
