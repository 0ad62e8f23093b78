"""Measure the EmbeddingLshIndex streaming-ingest claim (VERDICT r9 #7
— the vector index must carry the same scaling evidence as PQIndex):
write amplification is O(|delta|), INDEPENDENT of index size — a
micro-batch signs its own vectors (one bigint per vector) and appends
one immutable segment; prior segments are never touched.

Method mirrors scripts/ann_ingest_probe.py: build two EmbeddingLshIndex
instances from the sf0.1 embeddings — one over a SMALL corpus slice,
one over the 10x density-probe corpus — ingest the SAME 500-vector
delta into both, compare min-of-two ingest wall and bytes written under
each index dir. Equal deltas into unequal indexes must cost the same.

Usage: python scripts/emb_ingest_probe.py   (prints PROBE| lines)
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

    from cses2humio_spark.operators.dedup_index import EmbeddingLshIndex
    from cses2humio_spark.operators.similarity import auto_band_params
    from cses2humio_spark.session import get_spark
    from cses2humio_spark.sources.catalog import load_table

    spark = get_spark("emb-ingest-probe")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n = emb.count()
    delta = emb.filter(F.col("vec_id") >= n - 500)  # same 500-row delta
    big_dir = "/tmp/sfx10"
    if not os.path.exists(f"{big_dir}/embeddings.parquet"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import density_probe as DP

        DP.grow(spark, 10, big_dir)
    big = spark.read.parquet(f"{big_dir}/embeddings.parquet").filter(
        (F.col("vec_id") < n - 500)
        | ((F.col("vec_id") >= n) & (F.col("vec_id") < 10 * n - 500))
    )
    # geometry must be FIXED across both indexes: the probe compares
    # ingest cost, and a size-adaptive banding would change the bytes
    # per signature between the two (auto params of the small corpus)
    w, b = auto_band_params(n - 500)
    scratch = tempfile.mkdtemp(prefix="emb_probe_")
    for name, corpus in (
        ("small", emb.filter(F.col("vec_id") < n - 500)),
        ("big", big),
    ):
        tag = f"{name}({corpus.count()})"  # measured, not claimed
        d = os.path.join(scratch, name)
        idx = EmbeddingLshIndex(d, dim=64, n_planes=w, n_bands=b)
        idx.build(corpus)
        seg_before = dir_bytes(d, "seg=")
        best = None
        for trial in range(2):  # min-of-two; distinct batch ids so the
            t0 = time.perf_counter()  # replay guard doesn't skip trial 2
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
