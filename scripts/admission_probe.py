"""Measure the ADMISSION-LOOP scale claims (round 9), mirroring
scripts/dedup_index_probe.py:

A fixed 500-document micro-batch is decided (admit_batch) against a
small index and a 10x index. The claim under test: per-batch decision
cost is a function of the BATCH and its CANDIDATES — the corpus appears
only as (a) the signature-table side of one equi-join and (b) a
text/vector fetch for candidate PARTNER ids — so a 10x corpus must not
cost anywhere near 10x per batch.

Usage: python scripts/admission_probe.py   (prints ADMIT| lines)
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from cses2humio_spark.operators.dedup_index import MinHashIndex
    from cses2humio_spark.session import get_spark
    from cses2humio_spark.sources.catalog import load_table

    spark = get_spark("admission-probe")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    n = docs.count()
    batch = docs.filter(F.col("doc_id") >= n - 500)
    big_dir = "/tmp/sfx10"
    if not os.path.exists(f"{big_dir}/documents.parquet"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import density_probe as DP

        DP.grow(spark, 10, big_dir)
    # the x10 corpus contains shifted copies of every original id — the
    # probe batch's ids must be EXCLUDED or every batch doc probes as
    # already_indexed and the decision short-circuits
    # exclusions (ADVICE r9 #4 — labeled exactly now): the batch ids
    # [n-500, n) and the tail copies [10n-500, 10n) whose ids collide
    # with nothing but would shift the big corpus's candidate density
    big = spark.read.parquet(f"{big_dir}/documents.parquet").filter(
        (F.col("doc_id") < n - 500)
        | ((F.col("doc_id") >= n) & (F.col("doc_id") < 10 * n - 500))
    )
    scratch = tempfile.mkdtemp(prefix="admit_probe_")
    corpora = (
        ("small", docs.filter(F.col("doc_id") < n - 500)),
        ("big", big),
    )
    for name, corpus in corpora:
        tag = f"{name}({corpus.count()})"  # measured, not claimed
        d = os.path.join(scratch, tag.split("(")[0])
        idx = MinHashIndex(d)
        idx.build(corpus)
        best = None
        rows = None
        for _ in range(2):  # min-of-two (suite standard)
            t0 = time.perf_counter()
            dec = idx.admit_batch(batch, corpus)
            counts = {
                r["reason"]: r["n"]
                for r in dec.groupBy("reason")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
            rows = counts
            spark.catalog.clearCache()
        print(
            f"ADMIT| index={tag}: admit_batch(500 docs) min-wall={best:.2f}s "
            f"decisions={rows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
