"""Measure the sharded materialized-view write amplification (VERDICT r4
finding #1): bytes written per micro-batch as a function of table key
count, for a delta touching ONE key. The round-4 design rewrote the full
rollup every batch (O(|keys|) amplification); the sharded design must
rewrite only the touched bucket (O(|keys|/n_buckets)), flat in |keys| per
bucket.

Usage: python scripts/mv_shard_probe.py
Prints one JSON line per (n_keys) with bytes written by the 1-key batch.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    from cses2humio_spark.session import get_spark
    from cses2humio_spark.streaming.materialized import IncrementalRollup

    spark = get_spark("mv_shard_probe")
    n_buckets = 16
    for n_keys in (1_000, 10_000, 100_000):
        scratch = tempfile.mkdtemp(prefix="mv_probe_")
        try:
            table = os.path.join(scratch, "t")
            r = IncrementalRollup(
                table, key_col="uid", value_col="v", key_type="bigint",
                n_buckets=n_buckets,
            )
            base = spark.range(n_keys).selectExpr(
                "id AS uid", "CAST(id % 97 AS DOUBLE) AS v"
            )
            r(base, 0)
            before = dir_bytes(table)
            r(
                spark.createDataFrame([(3, 1.0)], "uid bigint, v double"),
                1,
            )
            after = dir_bytes(table)
            # bytes the 1-key batch added = new bucket version + manifest
            print(json.dumps({
                "n_keys": n_keys,
                "n_buckets": n_buckets,
                "table_bytes_full": before,
                "one_key_batch_bytes": after - before,
                "amplification_vs_full": round(
                    (after - before) / before, 4
                ),
            }))
        finally:
            shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
