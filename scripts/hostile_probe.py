"""Adversarial-session correctness sweep: run EVERY registered query
against its DuckDB oracle under session configs chosen to surface
environment-dependent bugs the friendly default session hides.

Variants:
  vanilla    no engine confs at all (the driver's session shape)
  hostile    America/New_York tz, 7 shuffle partitions, broadcast disabled
  degenerate 1 shuffle partition, ANSI off, Asia/Kathmandu (+05:45) tz

A query that is correct in all three is partitioning-independent,
tz-pinned, broadcast-agnostic, and ANSI-mode-agnostic. All three were
green at round 2 (119 queries) and round 3 (154 queries, final surface).

Usage: python scripts/hostile_probe.py [vanilla|hostile|degenerate]
(each variant needs a fresh process — Spark session confs stick).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "vanilla": {},
    "hostile": {
        "spark.sql.session.timeZone": "America/New_York",
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    },
    "degenerate": {
        "spark.sql.session.timeZone": "Asia/Kathmandu",
        "spark.sql.shuffle.partitions": "1",
        "spark.sql.ansi.enabled": "false",
    },
}


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "vanilla"
    confs = VARIANTS[variant]

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.master("local[8]")
    for k, v in confs.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    import __spark_entry__ as e
    from cses2humio_spark.queries.compare import compare_query

    qs, oracles = e.queries(), e.oracle_sql()
    bad = []
    for name, fn in qs.items():
        r = compare_query(spark, "/root/testdata/sf0.01", fn, oracles.get(name))
        if not r["ok"]:
            bad.append((name, r["status"][:200]))
    print(f"[{variant}] FAILED: {bad or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
