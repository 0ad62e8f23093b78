"""Measure the PQIndex streaming-ingest claim: write amplification is
O(|delta|), INDEPENDENT of index size — a micro-batch appends one
immutable segment and never touches prior segments (vs the sharded MV's
O(touched buckets), and vs a naive rewrite's O(index)).

Method: build two PQ indexes from the sf0.1 embeddings — one over a
SMALL corpus slice, one over the FULL corpus — then ingest the SAME
delta into both and compare ingest wall time and bytes written under
each index dir. Equal deltas into unequal indexes must cost the same.

Usage: python scripts/ann_ingest_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dir_bytes(root: str, prefix: str) -> int:
    total = 0
    for name in os.listdir(root):
        if not name.startswith(prefix):
            continue
        for dp, _dn, fns in os.walk(os.path.join(root, name)):
            total += sum(os.path.getsize(os.path.join(dp, f)) for f in fns)
    return total


def main() -> None:
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.ann_index import PQIndex
    from cses2humio_spark.session import get_spark
    from cses2humio_spark.sources.catalog import load_table

    spark = get_spark("ann-ingest-probe")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n = emb.count()
    delta = emb.filter(F.col("vec_id") >= n - 500)  # same 500-row delta
    # the big corpus comes from the density probe's 10x growth (20k rows
    # at sf0.1); regenerate with scripts/density_probe.py if absent
    big_dir = "/tmp/sfx10"
    if not os.path.exists(f"{big_dir}/embeddings.parquet"):
        import density_probe as DP

        DP.grow(spark, 10, big_dir)
    big = spark.read.parquet(f"{big_dir}/embeddings.parquet").filter(
        F.col("vec_id") < 10 * n - 500
    )
    scratch = tempfile.mkdtemp(prefix="ann_probe_")
    for tag, corpus in (
        (f"small({n - 500})", emb.filter(F.col("vec_id") < n - 500)),
        (f"big({10 * n - 500})", big),
    ):
        d = os.path.join(scratch, tag.split("(")[0])
        idx = PQIndex(d, m=4, k_codes=16, dim=64)
        idx.build(corpus)
        seg_before = dir_bytes(d, "seg=")
        best = None
        for trial in range(2):  # min-of-two; replay guard skips trial 2's
            t0 = time.perf_counter()  # apply, so use distinct batch ids
            idx(delta, trial)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        written = dir_bytes(d, "seg=") - seg_before
        print(
            f"PROBE| index={tag}: ingest(500 rows) min-wall={best:.2f}s "
            f"delta-bytes={written}",
            flush=True,
        )


if __name__ == "__main__":
    main()
