"""Isolated per-query re-time: min-of-N wall for the named queries, one
fresh bench-shaped session, warmup pass at sf0.001 first (absorbs codegen
/ Arrow init), then N timed passes at $SPARK_GRAFT_SF_DIR. Usage:

    SPARK_GRAFT_CPUS=32 python scripts/isolated_time.py q1 q2 ... [--n 4]

Prints one JSON line {query: [pass_seconds...]}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    n = 4
    args = []
    i = 0
    while i < len(argv):
        if argv[i] == "--n":
            n = int(argv[i + 1])
            i += 2
        elif argv[i].startswith("--n="):
            n = int(argv[i].split("=", 1)[1])
            i += 1
        else:
            args.append(argv[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from cses2humio_spark.queries import QUERIES
    from cses2humio_spark.session import get_spark

    spark = get_spark("isolated_time")
    spark.range(1).collect()
    out: dict[str, list[float]] = {}
    for name in args:
        fn = QUERIES[name]
        fn(spark, "/root/testdata/sf0.001").collect()  # warm plan/codegen
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        out[name] = walls
    print("ISOLATED " + json.dumps(out))


if __name__ == "__main__":
    main()
