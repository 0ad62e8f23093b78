"""Measure the InvertedTextIndex scaling claims (the same evidence
protocol every persisted index carries — ann_ingest_probe /
emb_ingest_probe for the vector twins):

1. INGEST write amplification is O(|delta postings|), INDEPENDENT of
   index size — a micro-batch appends one immutable segment pair and
   never touches prior segments. Equal deltas into unequal indexes must
   cost the same.
2. SEARCH reads pruned posting buckets + the narrow doc-length table,
   never document text — so a 10x corpus costs the search ~the pruned
   posting mass growth, while the FUSED bm25 query re-tokenizes 10x the
   text. The probe prints both walls on both corpora; the index/fused
   ratio widening with corpus size IS the build-once/search-many win.

Usage: python scripts/text_index_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TERMS = ["spark", "join", "window"]


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

    from cses2humio_spark.operators.text_index import InvertedTextIndex
    from cses2humio_spark.session import get_spark
    from cses2humio_spark.sources.catalog import load_table
    from tests.test_text_index import _fused_bm25

    spark = get_spark("text-index-probe")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    n = docs.count()
    delta = docs.filter(F.col("doc_id") >= n - 500)  # same 500-doc delta
    # the big corpus comes from the density probe's 10x growth;
    # regenerate with scripts/density_probe.py if absent
    big_dir = "/tmp/sfx10"
    if not os.path.exists(f"{big_dir}/documents.parquet"):
        import density_probe as DP

        DP.grow(spark, 10, big_dir)
    big = spark.read.parquet(f"{big_dir}/documents.parquet").filter(
        F.col("doc_id") < 10 * n - 500
    )
    scratch = tempfile.mkdtemp(prefix="text_probe_")
    for tag, corpus in (
        (f"small({n - 500})", docs.filter(F.col("doc_id") < n - 500)),
        (f"big({10 * n - 500})", big),
    ):
        d = os.path.join(scratch, tag.split("(")[0])
        idx = InvertedTextIndex(d, n_buckets=64)
        t0 = time.perf_counter()
        idx.build(corpus)
        build_wall = time.perf_counter() - t0
        seg_before = dir_bytes(d, "seg=") + dir_bytes(d, "dl=")
        best = None
        for trial in range(2):  # min-of-two; distinct batch ids so the
            t0 = time.perf_counter()  # replay guard doesn't skip trial 2
            idx(delta, trial)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        written = dir_bytes(d, "seg=") + dir_bytes(d, "dl=") - seg_before
        s_best = None
        for _ in range(2):
            t0 = time.perf_counter()
            idx.search(spark, TERMS, k=20).collect()
            dt = time.perf_counter() - t0
            s_best = dt if s_best is None or dt < s_best else s_best
        f_best = None
        for _ in range(2):
            t0 = time.perf_counter()
            _fused_bm25(corpus, TERMS, k=20).collect()
            dt = time.perf_counter() - t0
            f_best = dt if f_best is None or dt < f_best else f_best
        print(
            f"PROBE| index={tag}: build={build_wall:.2f}s "
            f"ingest(500 docs) min-wall={best:.2f}s delta-bytes={written} "
            f"search min-wall={s_best:.2f}s fused-bm25 min-wall={f_best:.2f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
