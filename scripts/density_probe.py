"""Reproduce docs/SCALING.md: grow per-key density Kx and re-time headline
queries.

Unlike scripts/scale_probe.py (which REMAPS keys per copy so entity
cardinality grows and per-key density stays fixed — the benign shape),
this probe keeps the key universe fixed and replicates facts Kx: same
users with Kx events each, same customers with Kx orders. That is the
shape that exposes quadratic-per-key behavior (range joins, LSH buckets).

Usage: python scripts/density_probe.py [K] [out_dir]
  K        replication factor (default 10)
  out_dir  scratch dir for the grown dataset (default /tmp/sfx{K})

Prints one line per headline query: name, 1x wall, Kx wall, ratio.

Caveat: this drives the WHOLE suite through one long-lived JVM session,
so at Kx the heavier queries also absorb cross-query memory pressure
(GC) that a per-query fresh session does not — expect the hot queries to
read 2-3x above their isolated numbers (docs/SCALING.md's table was
measured per-query; isolated re-runs reproduce it). The ORDERING of
ratios, which is what identifies superlinear queries, is stable either
way.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

# facts replicate with shifted PRIMARY keys (orders+lineitem share one
# shift so the orderkey join survives); foreign keys into the fixed
# dimensions (user_id, custkey, suppkey, partkey) are left unshifted on
# purpose — that is what grows per-key density.
FACTS = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
}
DIMS = ("region", "nation", "customer", "supplier", "part")


def grow(spark, k: int, out: str) -> None:
    from pyspark.sql import functions as F

    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    def x_k(df, key, shift):
        big = df
        for i in range(1, k):
            big = big.unionByName(df.withColumn(key, F.col(key) + F.lit(i * shift)))
        return big

    for tbl, key in FACTS.items():
        df = spark.read.parquet(f"{BASE}/{tbl}.parquet")
        shift = df.agg(F.max(key)).collect()[0][0] + 1
        x_k(df, key, shift).write.mode("overwrite").parquet(f"{out}/{tbl}.parquet")
    o = spark.read.parquet(f"{BASE}/orders.parquet")
    li = spark.read.parquet(f"{BASE}/lineitem.parquet")
    shift = (
        max(
            o.agg(F.max("o_orderkey")).collect()[0][0],
            li.agg(F.max("l_orderkey")).collect()[0][0],
        )
        + 1
    )
    x_k(o, "o_orderkey", shift).write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    x_k(li, "l_orderkey", shift).write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    for tbl in DIMS:
        spark.read.parquet(f"{BASE}/{tbl}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{tbl}.parquet")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sfx{k}"

    from cses2humio_spark.queries import QUERIES
    from cses2humio_spark.session import get_spark

    import bench as B

    spark = get_spark("density-probe")
    spark.range(1).collect()
    if not os.path.isdir(out) or not os.path.exists(f"{out}/lineitem.parquet"):
        print(f"growing {k}x dataset into {out} ...", file=sys.stderr)
        grow(spark, k, out)

    names = [n for n in B.HEADLINE if n in QUERIES]
    for n in names:  # plan/codegen warmup off the clock
        QUERIES[n](spark, WARM).collect()
    spark.catalog.clearCache()

    results: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((BASE, "1x"), (out, f"{k}x")):
        for _ in range(2):
            for n in names:
                t0 = time.perf_counter()
                QUERIES[n](spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                cur = results.setdefault(n, {})
                cur[tag] = min(cur.get(tag, dt), dt)
                spark.catalog.clearCache()
    print(f"{'query':35s} {'1x':>7s} {k:>5d}x  ratio")
    for n, r in results.items():
        print(
            f"{n:35s} {r['1x']:7.2f} {r[f'{k}x']:6.2f} {r[f'{k}x']/r['1x']:6.1f}"
        )


if __name__ == "__main__":
    main()
