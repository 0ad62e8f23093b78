"""Adversarial mass-duplicate probe: one boilerplate text replicated N
times (the round-3 verdict's 100 TB failure scenario — a page duplicated
10^6 times makes one (band, sig) bucket emit ~10^12 clique pairs).

Measures minhash_candidate_pairs wall time and emitted-pair count with
the round-4 bucket cap ON (default max_bucket_size=2000 -> star collapse)
vs OFF (full clique), at growing N. The uncapped run is skipped once its
pair count would exceed ~10^7 (the point of the probe is that the capped
path stays O(N) where the clique is O(N^2)).

Usage: python scripts/massdup_probe.py [N1 N2 ...]   (default 2000 8000 32000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [2000, 8000, 32000]

    from cses2humio_spark.operators.dedup import minhash_candidate_pairs
    from cses2humio_spark.session import get_spark

    spark = get_spark("massdup-probe")
    spark.range(1).collect()
    text = "the same boilerplate page body repeated verbatim every time"
    # JVM/codegen warmup off the clock
    warm = spark.range(50).selectExpr("id AS doc_id", f"'{text}' AS text")
    minhash_candidate_pairs(warm, "doc_id", "text").count()

    print(f"{'N copies':>9s} {'mode':>8s} {'pairs':>12s} {'wall (s)':>9s}")
    for n in sizes:
        docs = spark.range(n + 1).selectExpr(
            "id AS doc_id",
            f"CASE WHEN id < {n} THEN '{text}' "
            "ELSE 'a completely different text here' END AS text",
        )
        docs = docs.repartition(8).persist()
        docs.count()
        for capped in (True, False):
            if not capped and (n * (n - 1)) // 2 > 10_000_000:
                print(f"{n:9d} {'clique':>8s} {'(skipped)':>12s} {'-':>9s}")
                continue
            t0 = time.perf_counter()
            cnt = minhash_candidate_pairs(
                docs,
                "doc_id",
                "text",
                max_bucket_size=2000 if capped else None,
            ).count()
            dt = time.perf_counter() - t0
            print(
                f"{n:9d} {'star' if capped else 'clique':>8s} "
                f"{cnt:12d} {dt:9.2f}"
            )
        docs.unpersist()


if __name__ == "__main__":
    main()
