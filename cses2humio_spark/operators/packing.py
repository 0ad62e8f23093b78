"""Sequence packing: greedy bin-packing of documents into fixed
token-budget training sequences (the step between curation and batching in
an LLM data pipeline — unpacked batches waste the padding fraction of every
accelerator step).

Semantics (deterministic, engine-independent):

- Documents are hash-assigned to ``n_buckets`` packing buckets
  (md5(doc_id) — a pure function of the id, like
  ``deterministic_split_counts``), so the packing is stable across runs,
  engines, cluster sizes, and input partitioning.
- Within a bucket, documents are processed in ascending id order and
  packed first-fit-sequential: a document starts a new pack exactly when
  adding it would push the running token total over ``budget``. A document
  alone larger than the budget gets its own (overflowing) pack — truncation
  is a separate, explicit pipeline stage, never an implicit side effect of
  packing.

Scale design: the only shuffle is the hash partition on bucket, and it
carries (bucket, id, n_tokens) — never document text. Packing itself is
inherently sequential *within* a pack, so the parallel unit is the bucket:
size ``n_buckets`` to the cluster (buckets ~ cores x a small factor), and
the per-bucket state inside ``applyInPandas`` is two integers + the
bucket's (id, n_tokens) frame, Arrow-batched. Cross-bucket packing quality
loss vs a global greedy pass is the usual trade and is measured, not
hidden: ``pack_stats`` reports fill ratios.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = (
    "bucket bigint, doc_id bigint, n_tokens bigint, pack_id bigint, "
    "pack_pos bigint"
)


def hash_bucket(id_col: F.Column, n_buckets: int, salt: str = "pack:") -> F.Column:
    """Deterministic bucket from md5(id) — first 8 hex digits as an int.
    Identical in DuckDB: ('0x' || substr(md5(...), 1, 8))::BIGINT % n."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % n_buckets
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign every document to a (bucket, pack_id) training sequence.

    Input needs ``id_col`` and a precomputed ``tokens_col`` (pack over the
    narrow projection — at 100 TB the text column must not ride this
    shuffle). Output: (bucket, doc_id, n_tokens, pack_id, pack_pos) with
    pack_id dense per bucket and pack_pos the document's position within
    its pack."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    narrow = df.select(
        hash_bucket(F.col(id_col), n_buckets).alias("bucket"),
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.col(tokens_col).cast("bigint").alias("n_tokens"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        pack_ids, positions = [], []
        acc = 0
        pid = -1  # first doc always opens pack 0
        pos = 0
        for tok in pdf["n_tokens"]:
            if pid < 0 or acc + tok > budget:
                pid += 1
                acc = 0
                pos = 0
            acc += tok
            pack_ids.append(pid)
            positions.append(pos)
            pos += 1
        pdf["pack_id"] = pack_ids
        pdf["pack_pos"] = positions
        return pdf

    return narrow.groupBy("bucket").applyInPandas(_pack, PACK_SCHEMA)


def pack_stats(assignments: DataFrame, budget: int) -> DataFrame:
    """Packing-efficiency report over ``pack_sequences`` output: one row —
    pack count, mean docs per pack, mean/min fill ratio, and the count of
    overflow packs (single documents larger than the budget). The metric
    that justifies (or indicts) the bucket count and budget choice."""
    per_pack = assignments.groupBy("bucket", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )
    fill = F.least(F.col("pack_tokens") / F.lit(float(budget)), F.lit(1.0))
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.round(F.avg("n_docs"), 6).alias("avg_docs_per_pack"),
        F.round(F.avg(fill), 6).alias("avg_fill"),
        F.round(F.min(fill), 6).alias("min_fill"),
        F.sum((F.col("pack_tokens") > budget).cast("bigint"))
        .cast("bigint")
        .alias("n_overflow_packs"),
    )


def pack_sequences_iter(
    df: DataFrame,
    budget: int,
    n_buckets: int = 32,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """mapInPandas variant of ``pack_sequences`` for buckets too large to
    hold as one grouped frame: repartition by bucket, sort within
    partitions, and stream Arrow batches through a running packer. Same
    output contract; memory is O(arrow batch), not O(bucket)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    narrow = (
        df.select(
            hash_bucket(F.col(id_col), n_buckets).alias("bucket"),
            F.col(id_col).cast("bigint").alias("doc_id"),
            F.col(tokens_col).cast("bigint").alias("n_tokens"),
        )
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("bucket", "doc_id")
    )

    def _pack_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: dict[int, tuple[int, int, int]] = {}  # bucket -> (acc,pid,pos)
        for pdf in batches:
            pack_ids, positions = [], []
            for bucket, tok in zip(pdf["bucket"], pdf["n_tokens"]):
                acc, pid, pos = state.get(int(bucket), (0, -1, 0))
                if pid < 0 or acc + tok > budget:
                    pid += 1
                    acc = 0
                    pos = 0
                acc += int(tok)
                pack_ids.append(pid)
                positions.append(pos)
                state[int(bucket)] = (acc, pid, pos + 1)
            out = pdf.copy()
            out["pack_id"] = pack_ids
            out["pack_pos"] = positions
            yield out

    return narrow.mapInPandas(_pack_stream, PACK_SCHEMA)
